"""Summarize a jax.profiler xplane trace: top HLO ops by self-time.

Usage: python tools/parse_xplane.py /tmp/trace_r3 [top_n]

Uses xprof's raw_to_tool_data conversion (the tensorboard profile plugin
backend) to produce the hlo_op_stats table and prints the top rows —
enough to see where a train step's wall-clock goes without a browser.
"""
import csv
import io
import glob
import sys


def main(logdir: str, top_n: int = 40):
    xplanes = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not xplanes:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    from xprof.convert import raw_to_tool_data as rtd

    params = {"tqx": "out:csv;"}
    for tool in ("hlo_op_stats", "op_stats", "hlo_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, params)
            break
        except Exception as e:  # noqa: PERF203
            err = e
    else:
        raise SystemExit(f"no tool worked: {err}")
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    rows = list(csv.reader(io.StringIO(data)))
    head = rows[0]
    # find the self-time and name-ish columns
    def col(*names):
        for n in names:
            for i, h in enumerate(head):
                if n.lower() in h.lower():
                    return i
        return None
    c_time = col("total self time (us)", "self time (us)", "self-time")
    c_name = col("hlo op expression", "op name", "hlo op name", "name")
    c_cat = col("category")
    c_pct = col("total self time (%)", "self time (%)")
    print(f"columns: {head}")
    body = rows[1:]
    if c_time is not None:
        body.sort(key=lambda r: -float(r[c_time] or 0))
    for r in body[:top_n]:
        t = r[c_time] if c_time is not None else "?"
        pct = r[c_pct] if c_pct is not None else "?"
        cat = r[c_cat] if c_cat is not None else "?"
        nm = (r[c_name] if c_name is not None else str(r))[:140]
        print(f"{float(t):>12.0f} us  {pct:>6}%  {cat:<24} {nm}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
