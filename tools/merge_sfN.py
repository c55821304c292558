#!/usr/bin/env python3
"""Merge a subset check_oracle --json run into a committed
CORRECTNESS_sfN.json artifact.

Usage: merge_sfN.py <existing.json> <new_subset.json>

Keeps every existing entry, overwrites/adds entries from the subset run
that actually ran (drops the "missing result dir" rows check_oracle
records for entries that were not in the Verify subset), and refuses to
merge a non-green entry so a failed run can never silently degrade the
committed artifact.
"""
import json
import sys


def main():
    existing_path, new_path = sys.argv[1], sys.argv[2]
    existing = json.load(open(existing_path))
    new = json.load(open(new_path))
    merged = dict(existing)
    added, updated, skipped = [], [], []
    for name, res in sorted(new.items()):
        if res.get("err") == "missing result dir":
            continue  # entry was not part of this Verify subset
        if not (res.get("rows_match") and res.get("schema_match")
                and res.get("hash_match")):
            skipped.append((name, res.get("err")))
            continue
        (updated if name in merged else added).append(name)
        merged[name] = res
    if skipped:
        for name, err in skipped:
            print(f"REFUSED non-green entry: {name} err={err}")
        sys.exit(1)
    json.dump(merged, open(existing_path, "w"), indent=1, sort_keys=True)
    print(f"{existing_path}: {len(existing)} -> {len(merged)} entries "
          f"(+{len(added)} new: {added}; {len(updated)} re-verified)")


if __name__ == "__main__":
    main()
