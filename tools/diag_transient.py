#!/usr/bin/env python3
"""Correlate a Bench SPARK_GRAFT_DIAG jsonl with per-query walls to name
the sf10 full-sweep transient (SCALE.md standing caveat): for each timed
run, print the wall plus the DELTAS of JIT compilation time, GC time,
Janino codegen compiles, and the absolute heap/metaspace/code-cache pool
levels. A cluster of inflated walls lines up with exactly one of:
  - jit_ms flat + code_mb pinned at max  -> code cache full, compiler off
  - gc_ms spike                          -> heap pressure / eviction storm
  - janino_n rising on re-runs           -> codegen cache eviction recompiles
  - none of the above                    -> external (page cache, cgroup)
Usage: tools/diag_transient.py /tmp/diag.jsonl [baseline_bench.json]
With a baseline BENCH json, flags queries whose min wall inflated >2x.
"""
import json
import sys


def main():
    path = sys.argv[1]
    rows = [json.loads(l) for l in open(path) if l.strip()]
    base = None
    if len(sys.argv) > 2:
        base = json.load(open(sys.argv[2]))["queries"]

    prev = None
    print(f"{'query':<28}{'run':>4}{'sec':>9}{'dJIT_s':>8}{'dGC_s':>8}"
          f"{'dJan':>6}{'heapMB':>8}{'metaMB':>8}{'codeMB':>8}")
    flagged = []
    for r in rows:
        djit = dgc = djan = 0.0
        if prev is not None:
            djit = (r["jit_ms"] - prev["jit_ms"]) / 1000.0
            dgc = (r["gc_ms"] - prev["gc_ms"]) / 1000.0
            djan = r["janino_n"] - prev["janino_n"]
        mark = ""
        if base and r["q"] in base and base[r["q"]] > 0:
            ratio = r["sec"] / base[r["q"]] if base[r["q"]] else 0
            if ratio > 2 and r["sec"] > 0.5:
                mark = f"  <= {ratio:.1f}x baseline"
                flagged.append((r["q"], r["run"], r["sec"], ratio))
        print(f"{r['q']:<28}{r['run']:>4}{r['sec']:>9.2f}{djit:>8.1f}"
              f"{dgc:>8.1f}{djan:>6.0f}{r['heap_mb']:>8}{r['meta_mb']:>8}"
              f"{r['code_mb']:>8}{mark}")
        prev = r

    if rows:
        last = rows[-1]
        first = rows[0]
        print(f"\nsweep totals: JIT {(last['jit_ms']-first['jit_ms'])/1000:.0f}s, "
              f"GC {(last['gc_ms']-first['gc_ms'])/1000:.0f}s, "
              f"janino +{last['janino_n']-first['janino_n']} compiles, "
              f"final code cache {last['code_mb']} MB "
              f"(non-profiled {last['code_nonprof_mb']} MB), "
              f"meta {last['meta_mb']} MB")
    if flagged:
        print(f"\n{len(flagged)} run(s) >2x baseline:")
        for q, run, sec, ratio in flagged:
            print(f"  {q} run{run}: {sec:.2f}s ({ratio:.1f}x)")


if __name__ == "__main__":
    main()
