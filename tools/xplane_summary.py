"""Summarize a jax.profiler xplane trace into per-category / per-op time.

Usage: python tools/xplane_summary.py /tmp/trace_dir [top_n]

Feeds the xplane.pb through xprof's op_profile converter and prints, for the
LARGEST program (the K-long chained iteration in the bench tools), each HLO
category's total time and its top ops — normalized per chain iteration when
the program name is jit_chained (bench.py runs K iterations inside one scan).
"""

from __future__ import annotations

import glob
import json
import sys


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    from xprof.convert import raw_to_tool_data as rtd

    data, _ = rtd.xspace_to_tool_data([files[-1]], "op_profile", {})
    d = json.loads(data)
    root = d["byProgramExcludeIdle"]
    programs = [c for c in root.get("children", []) if c.get("children")]
    programs.sort(key=lambda p: -p["metrics"]["rawTime"])
    prog = programs[0]
    ptime = prog["metrics"]["rawTime"]
    print(f"program: {prog['name']}  total {ptime/1e12*1e3:.2f} ms")
    cats = sorted(prog["children"], key=lambda c: -c["metrics"]["rawTime"])
    for cat in cats:
        m = cat["metrics"]
        ct = m["rawTime"]
        print(
            f"\n{cat['name']:<46} {ct/1e12*1e3:8.2f} ms  ({ct/ptime*100:4.1f}%)"
            f"  mfu={m.get('flops', 0)*100:.0f}%"
        )
        ops = sorted(cat.get("children", []), key=lambda o: -o["metrics"]["rawTime"])
        for op in ops[:top_n]:
            om = op["metrics"]
            print(
                f"   {om['rawTime']/1e12*1e3:7.2f} ms  n={om.get('occurrences',0):5d}"
                f"  mfu={om.get('flops',0)*100:3.0f}%  {op['name'][:80]}"
            )


if __name__ == "__main__":
    main()
