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


def top_ops(trace_dir: str, top_n: int = 25):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    xspace = xplane_pb2.XSpace()
    with open(sorted(files)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    per_op = collections.Counter()
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
                per_op[name] += ev.duration_ps
                total += ev.duration_ps
    rows = per_op.most_common(top_n)
    print(f"total device op time: {total/1e9:.3f} ms (over all steps)")
    for name, ps in rows:
        print(f"{ps/1e9:9.3f} ms  {100.0*ps/max(total,1):5.1f}%  {name[:110]}")
    return rows, total


if __name__ == "__main__":
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    top_ops(d, n)
