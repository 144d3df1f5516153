"""Alignment metrics counters (reference PerfMetrics/--met role,
hisat2.cpp:2076: periodic tab-table of internal counters).

The reference merges per-thread metric structs under a mutex every 16
reads; here counters are naturally batch-granular — each pipeline stage
bumps them once per batch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class Metrics:
    start_time: float = field(default_factory=time.time)
    reads: int = 0
    batches: int = 0
    seeds: int = 0            # seed/segment lanes searched
    candidates: int = 0       # loci verified
    dp_lanes: int = 0         # gapped-rescue DP lanes
    splice_lanes: int = 0     # junction pairs scored
    fallback_reads: int = 0   # seed->segment fallback reads
    aligned: int = 0
    unaligned: int = 0
    multi: int = 0
    # per-stage wall time (seconds) — the profile that locates the next
    # bottleneck (reference Timer/-t + PerfMetrics timing role)
    t_pack: float = 0.0       # host read packing + dispatch enqueue
    t_fetch: float = 0.0      # device->host result transfer waits
    t_gather: float = 0.0     # slow-row gather round trips
    t_host: float = 0.0       # host selection + SAM formatting

    COLUMNS = ["elapsed", "reads", "batches", "seeds", "candidates",
               "dp_lanes", "splice_lanes", "fallback_reads",
               "aligned", "unaligned", "multi", "reads_per_sec",
               "t_pack", "t_fetch", "t_gather", "t_host"]

    def row(self) -> list:
        el = time.time() - self.start_time
        return [f"{el:.1f}", self.reads, self.batches, self.seeds,
                self.candidates, self.dp_lanes, self.splice_lanes,
                self.fallback_reads, self.aligned, self.unaligned,
                self.multi,
                f"{self.reads / el:.1f}" if el > 0 else "0",
                f"{self.t_pack:.2f}", f"{self.t_fetch:.2f}",
                f"{self.t_gather:.2f}", f"{self.t_host:.2f}"]

    def header_line(self) -> str:
        return "\t".join(self.COLUMNS)

    def line(self) -> str:
        return "\t".join(str(x) for x in self.row())


class MetricsSink:
    """--met-file / --met-stderr periodic emitter."""

    def __init__(self, metrics: Metrics, path: str | None = None,
                 stderr: bool = False, interval: float = 1.0):
        import sys
        self.m = metrics
        self.interval = interval
        self.last = 0.0
        self.fhs = []
        if path:
            fh = open(path, "w")
            self.fhs.append(fh)
        if stderr:
            self.fhs.append(sys.stderr)
        for fh in self.fhs:
            fh.write(metrics.header_line() + "\n")

    def tick(self, force: bool = False) -> None:
        now = time.time()
        if not force and now - self.last < self.interval:
            return
        self.last = now
        for fh in self.fhs:
            fh.write(self.m.line() + "\n")
            fh.flush()

    def close(self) -> None:
        self.tick(force=True)
        import sys
        for fh in self.fhs:
            if fh is not sys.stderr:
                fh.close()
