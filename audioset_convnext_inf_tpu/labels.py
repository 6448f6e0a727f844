"""AudioSet label metadata.

Parses ``class_labels_indices.csv`` (527 classes) into the four lookup maps
the reference exposes (utils/utilities.py:195-216 and utils/config.py:11-33).
Unlike the reference, the CSV path is resolved relative to the package
install, with an env-var override - no hard-coded cluster paths.
"""

from __future__ import annotations

import csv
import os
from functools import lru_cache
from typing import Dict, List, NamedTuple


class LabelMaps(NamedTuple):
    labels: List[str]
    ids: List[str]
    lb_to_ix: Dict[str, int]
    ix_to_lb: Dict[int, str]
    id_to_ix: Dict[str, int]
    ix_to_id: Dict[int, str]

    @property
    def classes_num(self) -> int:
        return len(self.labels)


def default_csv_path() -> str:
    env = os.environ.get("AUDIOSET_CLASS_LABELS_CSV")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, "metadata", "class_labels_indices.csv")


def read_audioset_ontology(ontology_json_path: str, id_to_ix: Dict[str, int] | None = None) -> List[str]:
    """Class descriptions from the AudioSet ontology JSON, in label order of
    appearance (utilities.py:127-150)."""
    import json

    if id_to_ix is None:
        id_to_ix = read_audioset_label_tags().id_to_ix
    with open(ontology_json_path, "r") as f:
        data = json.load(f)
    sentences = []
    for el in data:
        if el["id"] in id_to_ix:
            sentences.append(el["description"])
    return sentences


@lru_cache(maxsize=8)
def read_audioset_label_tags(csv_path: str | None = None) -> LabelMaps:
    """Read labels + mids from the AudioSet class CSV (header then 527 rows)."""
    path = csv_path or default_csv_path()
    with open(path, "r") as f:
        rows = list(csv.reader(f, delimiter=","))
    labels: List[str] = []
    ids: List[str] = []
    for row in rows[1:]:
        ids.append(row[1])
        labels.append(row[2])
    return LabelMaps(
        labels=labels,
        ids=ids,
        lb_to_ix={lb: i for i, lb in enumerate(labels)},
        ix_to_lb=dict(enumerate(labels)),
        id_to_ix={id_: i for i, id_ in enumerate(ids)},
        ix_to_id=dict(enumerate(ids)),
    )
