"""Summarize a jax.profiler xplane trace: top HLO ops by self-time.

Usage: python tools/parse_xplane.py /tmp/trace_r3 [top_n]

Uses xprof's raw_to_tool_data conversion (the tensorboard profile plugin
backend) to produce the hlo_stats table (gviz JSON) and prints the top rows
— enough to see where a train step's wall-clock goes without a browser.
"""
import glob
import json
import sys


def main(logdir: str, top_n: int = 40):
    xplanes = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not xplanes:
        raise SystemExit(f"no .xplane.pb under {logdir}")
    from xprof.convert import raw_to_tool_data as rtd

    tbl = None
    for tool in ("hlo_stats", "framework_op_stats"):
        data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        cand = json.loads(data)
        if isinstance(cand, list):  # framework_op_stats returns [table, ...]
            cand = cand[0]
        if cand.get("rows"):
            tbl = cand
            print(f"[{tool}]")
            break
        tbl = tbl or cand
    ids = [c["id"] for c in tbl["cols"]]

    def cell(row, cid):
        try:
            v = row["c"][ids.index(cid)]
            return v.get("v") if isinstance(v, dict) else v
        except (ValueError, IndexError, AttributeError, TypeError):
            return None

    rows = tbl.get("rows", [])
    rows.sort(key=lambda r: -(cell(r, "total_self_time") or 0))
    tot = sum((cell(r, "total_self_time") or 0) for r in rows)
    print(f"total self time: {tot/1e3:.1f} ms over {len(rows)} ops")

    # rollup by category (custom-calls further split by kernel prefix)
    cats = {}
    for r in rows:
        t = cell(r, "total_self_time") or 0
        cat = cell(r, "category") or "?"
        if cat == "custom-call":
            name = cell(r, "hlo_op_name") or "?"
            cat = "cc:" + name.split(".")[0].rstrip("_0123456789")
        cats[cat] = cats.get(cat, 0.0) + t
    print("\n[by category]")
    for cat, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{t:>10.0f} {t/max(tot,1)*100:>6.2f}  {cat}")
    print()
    print(f"{'self us':>10} {'%':>6} {'occ':>5}  {'category':<22} name")
    for r in rows[:top_n]:
        t = cell(r, "total_self_time") or 0
        pct = cell(r, "total_self_time_percent") or 0
        occ = cell(r, "occurrences") or 0
        cat = (cell(r, "category") or "?")[:22]
        name = (cell(r, "hlo_op_name") or "?")
        expr = (cell(r, "hlo_op_expression") or "")[:110]
        print(f"{t:>10.0f} {pct:>6.2f} {occ:>5}  {cat:<22} {name}  {expr}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 40)
