"""Two-process jax.distributed demonstration of the host axis (CPU).

The reference is single-process (SURVEY.md §2.2); the framework's host axis
is `jax.distributed.initialize` + process-strided corpus sharding
(parallel.corpus) + DCN/ICI collectives for global stats.  Real multi-chip
hardware is not available in this container, so this drives the SAME code
path as a local cluster: N processes, each with M virtual CPU devices,
a global mesh spanning all N*M devices, and a cross-process psum.

Usage:
  python tools/multihost_demo.py            # parent: spawns 2 workers
  (workers are re-invocations with EAQHM_MH_RANK set)

Writes tools/out/multihost_demo.json with per-process corpus strides and
the globally-reduced SRER statistic; asserts stride disjointness + coverage.
"""
import json
import os
import subprocess
import sys
import tempfile

N_PROC = 2
DEV_PER_PROC = 4
PORT = 12357


def worker(rank: int, outdir: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    import jax
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=N_PROC, process_id=rank)
    assert jax.process_count() == N_PROC, jax.process_count()
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from eaqhm_tpu.parallel import corpus as corpus_mod
    from eaqhm_tpu.parallel.mesh import multihost_init

    # multihost_init must report an already-joined cluster (and not raise)
    assert multihost_init() is True

    # --- host-strided corpus split: the same stride run_corpus* uses ---
    paths = [f"utt_{i:03d}.wav" for i in range(11)]
    nproc = jax.process_count()
    pidx = jax.process_index()
    my_paths = paths[pidx::nproc]

    # --- cross-process collective: global mesh over all devices, psum of
    # per-host partial SRER statistics (the corpus reducer's pattern) ---
    devs = np.array(jax.devices()).reshape(N_PROC * DEV_PER_PROC)
    mesh = Mesh(devs, ("data",))
    local = np.full((DEV_PER_PROC,), float(rank + 1), np.float32)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local,
        (N_PROC * DEV_PER_PROC,))

    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    total = float(global_sum(garr))
    expect = sum((r + 1) * DEV_PER_PROC for r in range(N_PROC))
    assert abs(total - expect) < 1e-6, (total, expect)

    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump({"rank": rank, "process_count": nproc,
                   "n_global_devices": len(jax.devices()),
                   "n_local_devices": len(jax.local_devices()),
                   "my_paths": my_paths, "global_psum": total,
                   "expected_psum": expect}, f)
    jax.distributed.shutdown()


def main():
    rank = os.environ.get("EAQHM_MH_RANK")
    if rank is not None:
        worker(int(rank), os.environ["EAQHM_MH_OUT"])
        return

    outdir = tempfile.mkdtemp(prefix="eaqhm_mh_")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for r in range(N_PROC):
        env = dict(os.environ, EAQHM_MH_RANK=str(r), EAQHM_MH_OUT=outdir,
                   PYTHONPATH=repo)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    ok = True
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        if p.returncode != 0:
            ok = False
            print(f"rank {r} FAILED:\n{out.decode()[-3000:]}")
    if not ok:
        sys.exit(1)

    ranks = [json.load(open(os.path.join(outdir, f"rank{r}.json")))
             for r in range(N_PROC)]
    # stride disjointness + coverage
    allp = sorted(sum((r["my_paths"] for r in ranks), []))
    assert allp == sorted(f"utt_{i:03d}.wav" for i in range(11)), allp
    assert all(r["process_count"] == N_PROC for r in ranks)
    assert all(r["n_global_devices"] == N_PROC * DEV_PER_PROC for r in ranks)
    assert all(r["global_psum"] == r["expected_psum"] for r in ranks)
    os.makedirs(os.path.join(os.path.dirname(__file__), "out"), exist_ok=True)
    out = {"n_processes": N_PROC, "devices_per_process": DEV_PER_PROC,
           "ranks": ranks, "stride_disjoint_and_covering": True}
    with open(os.path.join(os.path.dirname(__file__), "out",
                           "multihost_demo.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
