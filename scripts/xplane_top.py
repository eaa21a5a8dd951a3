"""Parse a jax.profiler xplane.pb and print top device ops by self time.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python scripts/xplane_top.py /tmp/jax_trace [top_n]

(The tensorboard profile plugin's native conversion path is broken in this
image; the raw proto walk below is the reliable route — see the verify
skill notes.)
"""

import collections
import glob
import sys


def _bucket(name: str) -> str:
    head = name.split(" = ", 1)[0].lstrip("%")
    base = head.rstrip("0123456789.").rstrip("-")
    if "copy" in base or "slice-start" in base or "slice-done" in base:
        return "async-copy"
    if "custom-call" in name.split(" = ", 1)[-1][:200] or base == "full":
        return "custom-call(pallas)"
    return base


def top_ops(trace_dir: str, top_n: int = 25, skip_copies: bool = False):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(files)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = collections.Counter()
    buckets = collections.Counter()
    total = 0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            # Only the XLA Ops line carries per-op self times; TraceMe and
            # Steps lines wrap entire regions and would double-count.
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                b = _bucket(name)
                buckets[b] += ev.duration_ps
                if skip_copies and b == "async-copy":
                    continue
                per_op[name] += ev.duration_ps
                total += ev.duration_ps
    rows = per_op.most_common(top_n)
    print(f"total device op time: {total/1e9:.3f} ms (over all steps"
          f"{', copies excluded' if skip_copies else ''})")
    print("-- buckets (incl. copies) --")
    for b, ps in buckets.most_common(12):
        print(f"{ps/1e9:9.3f} ms  {b}")
    print("-- top ops --")
    for name, ps in rows:
        print(f"{ps/1e9:9.3f} ms  {100.0*ps/max(total,1):5.1f}%  {name[:110]}")
    return rows, total


def module_spans(trace_dir: str):
    """Per-execution XLA-Modules spans: the TRUE device wall per step.
    (Summed async-copy op durations are start->done including queue wait
    and massively overlap — they are NOT additive wall time; round-3 read
    449/565 ms of 'copies' off a 45 ms step that way.)"""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(files)[-1], "rb") as f:
        xspace.ParseFromString(f.read())
    per_mod = collections.defaultdict(list)
    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if "XLA Modules" not in line.name:
                continue
            for ev in line.events:
                name = xspace_name = plane.event_metadata[ev.metadata_id].name
                per_mod[name.split("(")[0]].append(ev.duration_ps / 1e9)
    print("-- module spans (per-execution device wall, ms) --")
    for name, ts in sorted(per_mod.items()):
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"{name[:60]:60s} n={len(ts):3d} median={med:8.3f} "
              f"min={ts[0]:8.3f} max={ts[-1]:8.3f}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    d = args[0] if args else "/tmp/jax_trace"
    n = int(args[1]) if len(args) > 1 else 25
    if "--spans" in sys.argv:
        module_spans(d)
    else:
        top_ops(d, n, skip_copies="--nocopy" in sys.argv)
