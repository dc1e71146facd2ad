"""Per-stage wall-clock benchmarking.

TPU-native replacement for the reference's per-rule ``memusg -t`` /
``/usr/bin/time -v`` wrappers (/root/reference/bin/ntsynt_run_pipeline.smk:26-35):
instead of wrapping OS processes we time in-process stages and can emit a
``<prefix>.time.tsv`` summary.
"""

import contextlib
import json
import time
from collections import OrderedDict


class StageTimer:
    def __init__(self):
        self.stages = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt

    def write_tsv(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as fout:
            fout.write("stage\tseconds\n")
            for name, secs in self.stages.items():
                fout.write(f"{name}\t{secs:.4f}\n")

    def as_json(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in self.stages.items()})

    def total(self) -> float:
        return sum(self.stages.values())
