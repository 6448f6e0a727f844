"""Worker for the 2-process jax.distributed integration test.

Run as: python dist_worker.py <process_id> <jobid>
Exercises parallel/dist.py's SLURM env path (SLURM_NTASKS/PROCID/NODELIST
-> coordinator rendezvous) on the CPU backend with 2 virtual devices per
process, then checks the global mesh and a cross-process reduction.
"""
import os
import sys


def main() -> int:
    proc_id, jobid = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ["SLURM_NTASKS"] = "2"
    os.environ["SLURM_PROCID"] = str(proc_id)
    os.environ["SLURM_NODELIST"] = "localhost"
    os.environ["SLURM_JOBID"] = jobid

    from audioset_convnext_inf_tpu.parallel.dist import (initialize_distributed,
                                                         is_primary)

    assert initialize_distributed(), "SLURM env path did not initialize"
    assert is_primary() == (proc_id == 0)

    import numpy as np

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert len(jax.devices()) == 4, jax.devices()  # 2 procs x 2 local
    assert len(jax.local_devices()) == 2

    mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
    x = jax.device_put(np.ones((8, 4), np.float32), NamedSharding(mesh, P("data")))
    total = float(jax.jit(jnp.sum)(x))
    assert total == 32.0, total

    # primary-only eval over the LOCAL submesh (cli/train.py's multi-host
    # eval recipe): a single process must be able to run a full Evaluator
    # forward while the other process does nothing - the global mesh would
    # touch non-addressable devices here and crash
    if is_primary():
        from audioset_convnext_inf_tpu.config import ConvNeXtConfig
        from audioset_convnext_inf_tpu.engine.evaluator import Evaluator
        from audioset_convnext_inf_tpu.models import convnext as F
        from audioset_convnext_inf_tpu.parallel.mesh import get_mesh

        cfg = ConvNeXtConfig(name="dist_eval", depths=(1, 1, 1, 1),
                             dims=(8, 16, 32, 64), drop_path_rate=0.0)
        ev = Evaluator(F.init_params(jax.random.PRNGKey(0), cfg), cfg,
                       mesh=get_mesh(jax.local_devices()))
        wav = (np.random.RandomState(0).randn(2, 8000) * 0.1).astype(np.float32)
        probs = ev.infer_probs([{"waveform": wav}])["clipwise_output"]
        assert probs.shape == (2, 527) and np.isfinite(probs).all()
        print(f"proc {proc_id}: local-submesh eval OK {probs.shape}", flush=True)

    print(f"proc {proc_id}: OK global_devices=4 sum={total}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
