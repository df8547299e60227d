"""Runtime diagnostics: resource monitoring + phase timing.

Rebuild of the reference's psutil-based monitor
(/root/reference/scripts/prisim_resource_monitor.py:11-56, launched by
run_prisim.py:319-322) and its ad-hoc wall-clock tallies
(run_prisim.py:1967-1991). Single-process here: a background thread
samples CPU%/RSS (and jax device memory stats where the backend exposes
them) to a JSONL file; ``phase_timer`` wraps pipeline stages."""

from __future__ import annotations

import contextlib
import json
import threading
import time

__all__ = ["ResourceMonitor", "phase_timer"]


class ResourceMonitor:
    """Background sampler writing JSONL rows
    {t, cpu_percent, rss_bytes, device_bytes_in_use}."""

    def __init__(self, path, interval=1.0):
        self.path = path
        self.interval = float(interval)
        self._stop = threading.Event()
        self._thread = None

    def _device_bytes(self):
        try:
            import jax
            stats = jax.devices()[0].memory_stats()
            if stats:
                return int(stats.get("bytes_in_use", 0))
        except Exception:
            pass
        return None

    def _run(self):
        import psutil
        proc = psutil.Process()
        with open(self.path, "a") as f:
            while not self._stop.is_set():
                row = {
                    "t": time.time(),
                    "cpu_percent": proc.cpu_percent(interval=None),
                    "rss_bytes": proc.memory_info().rss,
                }
                dev = self._device_bytes()
                if dev is not None:
                    row["device_bytes_in_use"] = dev
                f.write(json.dumps(row) + "\n")
                f.flush()
                self._stop.wait(self.interval)

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


@contextlib.contextmanager
def phase_timer(name, sink=None, verbose=True):
    """Wall-clock timer for one pipeline phase; appends (name, seconds)
    to `sink` (list or dict) and/or prints."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if isinstance(sink, dict):
            sink[name] = sink.get(name, 0.0) + dt
        elif isinstance(sink, list):
            sink.append((name, dt))
        if verbose:
            print("[prisim_tpu] %-24s %8.3f s" % (name, dt))
