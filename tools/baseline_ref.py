"""Execute the BASELINE.md numeric protocol against the reference.

Runs the reference's own benchmark harnesses (carbonara.py:932-938) and
an injector-equivalent processing loop (cli/injector.py:58-107 minus
the WSGI/driver stack, which needs packages absent from this
container), recording the numbers into BASELINE_NUMBERS.json for
bench.py to compute a bench-vs-baseline ratio.

lz4 caveat: the container has no python-lz4, so a zlib(level=1) shim
stands in for lz4.block.  This affects ONLY the compressed
serialize/unserialize MB/s figures (marked "lz4=zlib1" in the output);
the engine-relevant numbers — resample Hz per method, split()/merge()
Hz, uncompressed serialize, and the injector-equivalent measures/s —
never touch lz4.
"""

from __future__ import annotations

import io
import json
import re
import statistics
import sys
import time
import types
import zlib
from contextlib import redirect_stdout


def _install_lz4_shim() -> None:
    lz4 = types.ModuleType("lz4")
    block = types.ModuleType("lz4.block")

    class LZ4BlockError(Exception):
        pass

    def compress(payload, *a, **kw):
        return zlib.compress(bytes(payload), 1)

    def decompress(payload, *a, **kw):
        try:
            return zlib.decompress(bytes(payload))
        except zlib.error:
            raise LZ4BlockError(str(payload[:8]))

    block.compress = compress
    block.decompress = decompress
    block.LZ4BlockError = LZ4BlockError
    lz4.block = block
    sys.modules["lz4"] = lz4
    sys.modules["lz4.block"] = block


def run_carbonara_benchmarks():
    """Both reference suites; parse the printed numbers."""
    buf = io.StringIO()
    from gnocchi import carbonara

    with redirect_stdout(buf):
        carbonara.BoundTimeSerie.benchmark()
        carbonara.AggregatedTimeSerie.benchmark()
    text = buf.getvalue()

    def all_floats(pattern):
        return [float(m) for m in re.findall(pattern, text)]

    out = {
        "raw_serialize_mb_s": statistics.median(
            all_floats(r"(?<!Un)(?<!compressed )Serialization speed: ([\d.]+) MB/s")
        ),
        "raw_bytes_per_point": statistics.median(
            all_floats(r"Bytes per point: ([\d.]+)")
        ),
        "agg_uncompressed_serialize_mb_s": statistics.median(
            all_floats(r"Uncompressed serialization speed: ([\d.]+) MB/s")
        ),
        "split_hz": statistics.median(all_floats(r"split\(\) speed: ([\d.]+) Hz")),
        "merge_hz": statistics.median(all_floats(r"merge\(\) speed ([\d.]+) Hz")),
        "resample_hz": {},
        "lz4_note": "compressed figures use a zlib(1) stand-in for lz4",
    }
    for agg in ["mean", "sum", "max", "min", "std", "median", "first",
                "last", "count", "5pct", "90pct"]:
        vals = all_floats(rf"resample\({re.escape(agg)}\) speed: ([\d.]+) Hz")
        out["resample_hz"][agg] = statistics.median(vals)
    return out, text


def run_injector_equivalent(n_metrics=1000, n_measures=1000, batch=100):
    """cli/injector.py:58-107 without the REST/driver stack: per metric,
    measures arrive in batches and are processed synchronously —
    BoundTimeSerie.set_values with a truncate callback aggregating the
    default-policy granularity and serializing the splits (the chef ->
    carbonara processing path the injector's --process exercises).
    Reports measures/s over metrics x measures.
    """
    import numpy

    from gnocchi import carbonara

    sampling = numpy.timedelta64(300, "s")  # 'low' policy: 5 min
    agg = carbonara.Aggregation("mean", sampling, None)
    block_size = sampling
    total = 0
    t0 = time.time()
    for _ in range(n_metrics):
        bound = carbonara.BoundTimeSerie(block_size=block_size, back_window=0)
        base = numpy.datetime64("2026-01-01T00:00:00")
        for b in range(n_measures // batch):
            ts = numpy.array(
                [base + numpy.timedelta64(b * batch + i, "s") for i in range(batch)],
                dtype="datetime64[ns]",
            )
            values = numpy.random.random(batch) * 100

            def _process(bts):
                grouped = bts.group_serie(sampling)
                ats = carbonara.AggregatedTimeSerie.from_grouped_serie(grouped, agg)
                for key, split in ats.split():
                    split.serialize(key, compressed=False)

            bound.set_values(
                numpy.array(
                    list(zip(ts, values)),
                    dtype=[("timestamps", "datetime64[ns]"), ("values", "float64")],
                ),
                before_truncate_callback=_process,
            )
            total += batch
    wall = time.time() - t0
    return {
        "n_metrics": n_metrics,
        "n_measures_per_metric": n_measures,
        "total_measures": total,
        "wall_s": round(wall, 3),
        "measures_per_s": round(total / wall, 1),
    }


def main():
    _install_lz4_shim()
    sys.path.insert(0, "/root/reference")

    bench, raw_text = run_carbonara_benchmarks()
    injector = run_injector_equivalent()
    out = {
        "machine": "container local[32] host, single-core numpy for reference",
        "carbonara": bench,
        "injector_equivalent": injector,
    }
    with open("/root/repo/BASELINE_NUMBERS.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
