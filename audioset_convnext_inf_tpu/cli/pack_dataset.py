"""Dataset packing CLI (reference utils/dataset.py).

    # pack audio files listed in an AudioSet CSV into one HDF5
    python -m audioset_convnext_inf_tpu.cli.pack_dataset pack \
        --csv meta.csv --audios-dir DIR --out packed.h5 [--mini-data N]

    # build the index file the samplers consume
    python -m audioset_convnext_inf_tpu.cli.pack_dataset index \
        --waveforms packed.h5 --out indexes.h5

    # split the unbalanced csv into 50k-row parts
    python -m audioset_convnext_inf_tpu.cli.pack_dataset split \
        --csv unbalanced_train_segments.csv --out-dir parts/

    # build a training blacklist of YouTube ids from DCASE2017-task4
    # segment CSVs (reference utils/create_black_list.py)
    python -m audioset_convnext_inf_tpu.cli.pack_dataset blacklist \
        --csvs testing_set.csv evaluation_set.csv --out black_list.csv
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pack")
    p.add_argument("--csv", required=True)
    p.add_argument("--audios-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--mini-data", type=int, default=0)
    p.add_argument("--audio-ext", default=".wav")

    p = sub.add_parser("index")
    p.add_argument("--waveforms", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("combine")
    p.add_argument("--indexes", nargs="+", required=True)
    p.add_argument("--out", required=True)

    p = sub.add_parser("split")
    p.add_argument("--csv", required=True)
    p.add_argument("--out-dir", required=True)

    p = sub.add_parser("blacklist")
    p.add_argument("--csvs", nargs="+", required=True,
                   help="DCASE2017-task4 style segment CSVs (first column "
                        "is a segment filename; the bare YouTube id is "
                        "extracted)")
    p.add_argument("--out", required=True)

    args = parser.parse_args(argv)

    from audioset_convnext_inf_tpu.data import (
        combine_indexes,
        create_indexes,
        pack_waveforms_to_hdf5,
        split_unbalanced_csv_to_partial_csvs,
    )

    if args.cmd == "pack":
        out = pack_waveforms_to_hdf5(args.csv, args.audios_dir, args.out,
                                     mini_data=args.mini_data, audio_ext=args.audio_ext)
    elif args.cmd == "index":
        out = create_indexes(args.waveforms, args.out)
    elif args.cmd == "combine":
        out = combine_indexes(args.indexes, args.out)
    elif args.cmd == "blacklist":
        from audioset_convnext_inf_tpu.data.blacklist import (
            dcase2017_task4_ids,
            write_black_list,
        )

        out = write_black_list(dcase2017_task4_ids(args.csvs), args.out)
    else:
        out = split_unbalanced_csv_to_partial_csvs(args.csv, args.out_dir)
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
