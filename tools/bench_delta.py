#!/usr/bin/env python3
"""Cross-round per-query bench delta: compare two bench_detail/rNN.json
dumps (written by graft.Bench on full-catalog runs) and emit a markdown
table of the queries whose wall-time moved more than THRESH x, plus the
run-level throttle fingerprint (retimed / coldsum — SCALE.md §9: the
clean band on this sandbox is retimed ~10-16, coldsum ~40-65; numbers
captured outside it are environment-dominated, not regressions).

Usage: python3 tools/bench_delta.py bench_detail/r12.json \
         bench_detail/r13.json [threshold=2.0] [> SCALE_delta.md]
"""
import json
import sys
from pathlib import Path


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    a_path, b_path = Path(sys.argv[1]), Path(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    a, b = json.loads(a_path.read_text()), json.loads(b_path.read_text())
    qa, qb = a["queries"], b["queries"]

    def fingerprint(tag, d):
        retimed, coldsum = d.get("retimed"), d.get("coldsum")
        clean = (retimed is not None and retimed <= 16 and
                 coldsum is not None and coldsum <= 65)
        note = "clean band" if clean else \
            "OUTSIDE clean band (retimed<=16, coldsum<=65): " \
            "environment-dominated, judge per-query floors by min-of-N"
        return (f"- `{tag}`: total {d.get('value')}s over "
                f"{len(d['queries'])} queries, retimed={retimed}, "
                f"coldsum={coldsum} -> {note}")

    print(f"## Bench delta: {a_path.stem} -> {b_path.stem} "
          f"(flagging >{thresh}x)\n")
    print(fingerprint(a_path.stem, a))
    print(fingerprint(b_path.stem, b))
    print()

    common = sorted(set(qa) & set(qb))
    added = sorted(set(qb) - set(qa))
    removed = sorted(set(qa) - set(qb))
    flagged = []
    for q in common:
        va, vb = qa[q], qb[q]
        if va and vb and (vb / va > thresh or va / vb > thresh):
            flagged.append((vb / va, q, va, vb))
    flagged.sort(reverse=True)

    if flagged:
        print(f"| query | {a_path.stem} s | {b_path.stem} s | ratio |")
        print("|---|---|---|---|")
        for r, q, va, vb in flagged:
            print(f"| {q} | {va:.2f} | {vb:.2f} | {r:.2f}x |")
    else:
        print(f"No common query moved more than {thresh}x.")
    print()
    tot_common_a = sum(qa[q] for q in common)
    tot_common_b = sum(qb[q] for q in common)
    print(f"Common-query totals: {tot_common_a:.1f}s -> "
          f"{tot_common_b:.1f}s ({tot_common_b / tot_common_a:.2f}x) "
          f"over {len(common)} queries.")
    if added:
        print(f"\nNew in {b_path.stem}: " + ", ".join(
            f"{q} ({qb[q]:.2f}s)" for q in added))
    if removed:
        print(f"\nGone since {a_path.stem}: " + ", ".join(removed))


if __name__ == "__main__":
    main()
