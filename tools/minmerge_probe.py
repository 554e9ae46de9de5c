#!/usr/bin/env python3
"""Row-wise min-merge SCALE_PROBE.md with its last committed version.

ScaleProbeSpec REWRITES the file with the current run's timings, which
under host load can be 2-3x degraded. Labels are stable and the note
column (shuffle-row counts etc.) is deterministic, so the repo convention
is: per-label MIN of seconds, keeping the NEW run's note and row order
(new rows appear with their fresh numbers; rows only in the committed
version are appended at the end so a partial probe run never silently
drops recorded evidence).

Usage: python3 tools/minmerge_probe.py [GOOD_REF] [FILE]
GOOD_REF defaults to HEAD; FILE defaults to SCALE_PROBE.md.
"""
import re
import subprocess
import sys

ROW = re.compile(r"^\| (.+?) \| ([0-9.]+|—) \| (.*) \|$")


def parse(text: str):
    header, rows, order = [], {}, []
    for line in text.splitlines():
        m = ROW.match(line)
        if m and m.group(1) != "step" and not set(m.group(1)) == {"-"}:
            label, sec, note = m.groups()
            rows[label] = (sec, note)
            order.append(label)
        else:
            header.append(line)
    return header, rows, order


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
    path = sys.argv[2] if len(sys.argv) > 2 else "SCALE_PROBE.md"
    disk = open(path).read()
    out = subprocess.run(["git", "show", f"{ref}:{path}"],
                         capture_output=True, text=True)
    if out.returncode != 0:
        raise SystemExit(f"git show {ref}:{path} failed: {out.stderr.strip()}")
    _, committed, committed_order = parse(out.stdout)
    merged_lines = []
    seen = set()
    improved = kept = 0
    for line in disk.splitlines():
        m = ROW.match(line)
        if not m or m.group(1) == "step" or set(m.group(1)) == {"-"}:
            merged_lines.append(line)
            continue
        label, sec, note = m.groups()
        seen.add(label)
        if label in committed and sec != "—" and committed[label][0] != "—":
            old = float(committed[label][0])
            new = float(sec)
            if old < new:
                sec = committed[label][0]
                kept += 1
            else:
                improved += 1
        merged_lines.append(f"| {label} | {sec} | {note} |")
    # rows recorded in the committed file but absent from this run (e.g. a
    # lower probe level) are appended so evidence never silently drops
    missing = [l for l in committed_order if l not in seen]
    if missing:
        tail = [f"| {l} | {committed[l][0]} | {committed[l][1]} |" for l in missing]
        # insert after the last table row
        last_row = max(i for i, ln in enumerate(merged_lines) if ROW.match(ln))
        merged_lines[last_row + 1:last_row + 1] = tail
    open(path, "w").write("\n".join(merged_lines) + "\n")
    print(f"merged {path}: {improved} rows improved/new-min, {kept} kept committed min, "
          f"{len(missing)} committed-only rows re-appended")


if __name__ == "__main__":
    main()
