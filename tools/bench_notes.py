#!/usr/bin/env python3
"""Regenerate the numbers section of BENCH_NOTES.md from a BENCH artifact.

VERDICT r3/r4 both flagged hand-typed bench numbers drifting from the
committed artifact. This tool makes the notes mechanically derived: every
figure between the GENERATED markers comes from the artifact JSON itself,
and an optional previous-round artifact drives the delta table.

Usage: python3 tools/bench_notes.py [CURRENT.json] [PREVIOUS.json]
Defaults: BENCH.json and the highest-numbered BENCH_r*.json before it.
Rewrites the block between the markers in BENCH_NOTES.md in place.
"""
import json, re, sys, glob, os

BEGIN = "<!-- GENERATED:BEGIN (tools/bench_notes.py) -->"
END = "<!-- GENERATED:END -->"


def load(path):
    with open(path) as f:
        d = json.load(f)
    # driver artifacts wrap the JSON line inside a "tail" field
    if "queries" not in d and "tail" in d:
        m = re.search(r'\{"metric":.*\}', d["tail"])
        if m is None:
            sys.exit(f"{path}: no metric JSON line in the artifact tail "
                     "(crashed or truncated bench run?)")
        d = json.loads(m.group(0))
    return d


def round_no(path):
    m = re.search(r"BENCH_r(\d+)\.json$", path)
    return int(m.group(1)) if m else -1


def fmt(v):
    return f"{v:.2f}"


def main():
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH.json"
    if len(sys.argv) > 2:
        prev_path = sys.argv[2]
    else:
        # numeric round order (lexicographic misorders r100 vs r11), and
        # never the current artifact itself: when CURRENT is BENCH_rN, prev
        # is the highest round strictly below N, as the docstring promises
        cur_no = round_no(cur_path)
        arts = sorted(glob.glob("BENCH_r*.json"), key=round_no)
        if cur_no >= 0:
            arts = [a for a in arts if round_no(a) < cur_no]
        prev_path = arts[-1] if arts else None
    cur = load(cur_path)
    q = {k: v for k, v in cur["queries"].items() if not k.startswith("_")}
    harness = {k: v for k, v in cur["queries"].items() if k.startswith("_")}
    # driver artifacts carry a stdout line auto-shrunk to the top-N
    # slowest queries plus one `_other_Nq` aggregate — recover the true
    # query count from it so the headline never understates coverage.
    # Round <= 15 artifacts came from the old topLine whose top-40 and
    # _other bucket MIXED harness entries with queries (ADVICE r15): for
    # those, every harness key that EXISTED that round but is absent from
    # the line sat inside the _other count, so subtract them. The round's
    # true harness set comes from its untruncated honest sibling artifact
    # (the set grew over rounds — a fixed global list would overcorrect
    # r3-r8, whose runs never recorded the later keys); with no honest
    # sibling the correction is skipped (at most _floor-sized slack).
    # Round >= 16 lines list all harness entries individually and count
    # queries only — already exact.
    other = sum(int(m.group(1)) for k in harness
                if (m := re.match(r"_other_(\d+)q$", k)))
    n = round_no(cur_path)
    if other and 0 <= n <= 15:
        sibling = next((p for p in (f"BENCH_r{n:02d}_honest.json",
                                    f"BENCH_r{n}_honest.json")
                        if os.path.exists(p)), None)
        if sibling:
            round_harness = {k for k in load(sibling)["queries"]
                             if k.startswith("_")}
            other -= len(round_harness - set(harness))
    trunc = (f" ({len(q)} listed individually, driver-truncated stdout line;"
             " use the honest merged artifact for the full per-query table)"
             if other else "")
    lines = [BEGIN, ""]
    lines.append(
        f"Headline (from `{os.path.basename(cur_path)}`): **total "
        f"{cur['value']} s across {len(q) + other} queries{trunc}, "
        f"{len(cur.get('errors', []))} errors**, runs={cur.get('runs', '?')}, "
        f"sf=`{cur.get('sf', '?')}`.")
    lines.append("")
    lines.append("Harness entries (excluded from the total): "
                 + ", ".join(f"`{k}` {fmt(v)} s"
                             for k, v in sorted(harness.items())) + ".")
    lines.append("")
    lines.append("Slowest 15 queries:")
    lines.append("")
    lines.append("| Query | sec |")
    lines.append("|---|---|")
    for k, v in sorted(q.items(), key=lambda kv: -kv[1])[:15]:
        lines.append(f"| `{k}` | {fmt(v)} |")
    if prev_path and os.path.exists(prev_path):
        prev = load(prev_path)
        pq = {k: v for k, v in prev["queries"].items()
              if not k.startswith("_")}
        common = sorted(set(q) & set(pq))
        moved = [(k, pq[k], q[k]) for k in common
                 if max(q[k], pq[k]) > 0.3
                 and (q[k] > pq[k] * 1.3 or pq[k] > q[k] * 1.3)]
        new = sorted(set(q) - set(pq))
        # driver artifacts keep only the slowest ~40 queries plus an
        # _other_Nq aggregate — absent-from-prev then does NOT mean new
        truncated = any(k.startswith("_other_") for k in prev["queries"])
        lines.append("")
        if truncated:
            lines.append(
                f"Vs `{os.path.basename(prev_path)}` (total {prev['value']} s;"
                f" artifact truncated to its {len(pq)} slowest queries, so"
                f" only those can be compared): {len(moved)} moved >1.3x"
                f" (>0.3 s):")
        else:
            lines.append(
                f"Vs `{os.path.basename(prev_path)}` (total {prev['value']} s, "
                f"{len(pq)} queries): {len(new)} new "
                f"({', '.join('`%s`' % n for n in new) if new else '—'}); "
                f"{len(moved)} moved >1.3x (>0.3 s):")
        lines.append("")
        if moved:
            lines.append("| Query | prev | now |")
            lines.append("|---|---|---|")
            for k, a, b in sorted(moved, key=lambda t: -abs(t[2] - t[1])):
                lines.append(f"| `{k}` | {fmt(a)} | {fmt(b)} |")
        else:
            lines.append("(none)")
    lines += ["", END]
    block = "\n".join(lines)
    with open("BENCH_NOTES.md") as f:
        notes = f.read()
    if BEGIN in notes:
        notes = re.sub(re.escape(BEGIN) + ".*?" + re.escape(END), block,
                       notes, flags=re.S)
    else:
        notes = notes.rstrip() + "\n\n" + block + "\n"
    with open("BENCH_NOTES.md", "w") as f:
        f.write(notes)
    print(f"BENCH_NOTES.md updated from {cur_path}"
          + (f" (delta vs {prev_path})" if prev_path else ""))


if __name__ == "__main__":
    main()
