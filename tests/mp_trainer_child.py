"""Child process for the end-to-end multi-host Trainer test.

Joins a 2-process JAX distributed runtime (CPU, gloo, 2 virtual devices per
process = 4-device global dp mesh) and runs the REAL ``Trainer`` with
``distributed=True`` on a tiny on-disk dataset: global batch 4, 2 epochs,
mini spec.  Process 0 writes orbax checkpoints and JSONL loss logs that the
parent compares against an identical single-process ``data_parallel=4`` run.

Run as: python mp_trainer_child.py <pid> <nproc> <port> <data_dir> <out_dir>
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)                    # minispec
sys.path.insert(0, os.path.dirname(_HERE))  # amyloid_yolo_tpu


def main():
    pid, nproc, port, data_dir, out_dir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5])
    from amyloid_yolo_tpu.parallel import distributed as dist
    dist.initialize(f"127.0.0.1:{port}", nproc, pid,
                    cpu_devices_per_process=2)

    from amyloid_yolo_tpu.training import Trainer, TrainConfig
    from minispec import mini_spec

    cfg = TrainConfig(
        data_config=os.path.join(data_dir, "custom.data"),
        epochs=2,
        batch_size=4,              # GLOBAL batch: 1 image per device
        gradient_accumulations=1,
        img_size=64,
        multiscale=False,
        augment=False,
        evaluation_interval=0,     # skip eval (saves a CPU compile)
        checkpoint_dir=os.path.join(out_dir, "ckpt"),
        logdir=os.path.join(out_dir, "logs"),
        seed=0,
        distributed=True,
        verbose=True,
    )
    trainer = Trainer(cfg, spec=mini_spec())
    assert trainer.nproc == nproc, trainer.nproc
    trainer.train()
    print("MP_TRAIN_OK", flush=True)


if __name__ == "__main__":
    main()
