"""Child process for tests/test_distributed.py.

Joins a 2-process JAX distributed runtime (CPU backend, gloo collectives,
2 virtual devices per process = 4-device global dp mesh), runs ONE global
data-parallel train step on the mini spec with this process's local half of
the batch, prints the replicated loss, and (process 0) dumps the post-step
params for the parent to compare against the single-process result.

Run as: python mp_child.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                    # minispec
sys.path.insert(0, os.path.dirname(_HERE))  # amyloid_yolo_tpu


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    from amyloid_yolo_tpu.parallel import distributed as dist
    dist.initialize(f"127.0.0.1:{port}", nproc, pid,
                    cpu_devices_per_process=2)

    import jax
    from amyloid_yolo_tpu.models import darknet
    from amyloid_yolo_tpu.parallel import steps as S
    from minispec import mini_spec

    assert jax.process_count() == nproc

    # Same fixture as tests/test_parallel.py::setup — global batch 8.
    spec = mini_spec()
    params = darknet.init_params(jax.random.PRNGKey(0), spec)
    B, cap = 8, 4
    rngs = np.random.RandomState(5)
    imgs = rngs.randint(0, 255, (B, 64, 64, 3)).astype(np.uint8)
    targets = np.zeros((B * cap, 6), np.float32)
    mask = np.zeros((B * cap,), bool)
    for b in range(B):
        targets[b * cap] = [b, b % 2, 0.4 + 0.05 * b / B, 0.5, 0.2, 0.25]
        mask[b * cap] = True

    opt = S.make_optimizer()
    step = S.make_train_step(spec, opt, augment=False)
    mesh = dist.global_mesh()
    assert mesh.devices.size == 2 * nproc
    sharded = dist.shard_train_step_multiprocess(step, mesh)
    state = S.init_train_state(params, opt)

    # This process's local rows: mesh device order is process-major, so
    # process p owns the contiguous global rows [p*B/n, (p+1)*B/n).  The
    # flat (B*cap, 6) target rows keep their GLOBAL image indices — the
    # jitted program has global-batch semantics.
    local_b = B // nproc
    lo, hi = pid * local_b, (pid + 1) * local_b
    s2, m = sharded(state, imgs[lo:hi], targets[lo * cap:hi * cap],
                    mask[lo * cap:hi * cap], jax.random.PRNGKey(0), 64)

    loss = float(dist.fetch_replicated(m["loss"]))
    print(f"MP_LOSS {loss!r}", flush=True)
    if pid == 0 and out != "-":
        flat = {}
        for k, entry in s2.params.items():
            for kk, v in entry.items():
                flat[f"{k}/{kk}"] = np.asarray(dist.fetch_replicated(v))
        np.savez(out, **flat)
    print("MP_OK", flush=True)


if __name__ == "__main__":
    main()
