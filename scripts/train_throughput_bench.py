"""Training-step throughput of SimpleFCN on the TPU at 768x384.

The reference never published training throughput (its 60k-iteration runs
were just left overnight on a GTX 1080 Ti); this sweeps ours for the table
in docs/TIMING.md. Thin wrapper over the timing CLI's ``time_train_step``
command (experiments/timing.py) so there is exactly one measurement recipe.

Run: python scripts/train_throughput_bench.py
"""

import os
import sys
from types import SimpleNamespace

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from experiments.timing import time_train_step  # noqa: E402


def main():
    print(f"{'batch':>5} {'dtype':>9} {'s/step':>9} {'img/s':>8}")
    for compute_dtype in ("bfloat16", "float32"):
        for batchsize in (1, 4, 8):
            run = SimpleNamespace(info={})
            time_train_step(_run=run, compute_dtype=compute_dtype,
                            batchsize=batchsize, repetitions=30)
            result = run.info["timings"]["train_step"]
            print(f"{batchsize:>5} {compute_dtype:>9} "
                  f"{result['s_per_step']:>9.4f} "
                  f"{result['img_per_s']:>8.1f}")


if __name__ == "__main__":
    main()
