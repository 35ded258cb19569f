"""Aggregate per-op device self-time from a jax.profiler xplane.pb.

The tensorboard_plugin_profile converter in this image is broken
(protobuf/pywrap mismatch), so parse the XSpace proto directly: take the
/device:TPU:0 plane's XLA-op lines, sum event durations per op name, and
print the top-K with each op's HLO category. Pair with
tools/profile_step.py, which captures the trace.

    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python tools/parse_xplane.py /tmp/vtx_profile [top_k]
"""
import collections
import glob
import os
import sys

try:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
except Exception:  # pragma: no cover - image-dependent fallback
    from tensorboard_plugin_profile.protobuf import xplane_pb2


def load(logdir: str):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def op_self_times(xs, plane_sub="/device:TPU"):
    planes = [p for p in xs.planes if plane_sub in p.name]
    if not planes:
        raise SystemExit(
            f"no plane matching {plane_sub!r}; have "
            f"{[p.name for p in xs.planes]}")
    plane = planes[0]
    emeta = plane.event_metadata
    smeta = plane.stat_metadata
    total = collections.Counter()    # op name -> ps
    count = collections.Counter()
    cat = {}
    for line in plane.lines:
        # the sync "XLA Ops" line: one event per executed HLO op. Async
        # spans (slice-start/done DMA prefetch pairs) overlap compute and
        # would dominate a duration sum, so they are skipped — the tensor
        # core is busy with sync ops underneath them anyway.
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = emeta[ev.metadata_id]
            short = md.name.split(" = ")[0]
            if "-start" in short or "-done" in short:
                continue
            total[md.name] += ev.duration_ps
            count[md.name] += 1
            if md.name not in cat:
                for st in md.stats:
                    if smeta[st.metadata_id].name == "hlo_category":
                        cat[md.name] = st.str_value
    return total, count, cat


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vtx_profile"
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs = load(logdir)
    total, count, cat = op_self_times(xs)
    grand = sum(total.values())
    print(f"total device op time: {grand / 1e12 * 1e3:.2f} ms "
          f"(all profiled steps)")
    print(f"{'ms':>8} {'%':>6} {'n':>5}  category: op")
    for name, ps in total.most_common(top_k):
        print(f"{ps / 1e12 * 1e3:8.3f} {ps / grand * 100:6.2f} "
              f"{count[name]:5d}  {cat.get(name, '?')}: {name[:110]}")
    # category rollup
    by_cat = collections.Counter()
    for name, ps in total.items():
        by_cat[cat.get(name, "?")] += ps
    print("\ncategory rollup:")
    for c, ps in by_cat.most_common():
        print(f"{ps / 1e12 * 1e3:8.3f} {ps / grand * 100:6.2f}  {c}")


if __name__ == "__main__":
    main()
