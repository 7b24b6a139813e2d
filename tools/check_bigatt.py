#!/usr/bin/env python3
"""Independent parity check for the big_attendance benchmark
(graft.tools.BigAttendance `check` stage dumps its inputs).

Re-renders the sampled TSV rows with PYTHON Jinja2 — the engine the
reference itself uses (earthmover/nodes/destination.py) — applying the
same YAML semantics (map_values TRUE->absent / FALSE->present,
rename attended->status, add school=12345, linearize = collapse
whitespace runs in the TEMPLATE SOURCE), then diffs the sorted line sets
against what the graft pipeline actually wrote. Exit 0 = parity.
"""
import re
import sys

BASE = "/tmp/graft_bigatt"

TEMPLATE = open(f"{BASE}/templates/studentSchoolAttendanceEvent.jsont").read()


def main():
    import jinja2

    # destination.py:95-96 — linearize collapses whitespace in the source
    linearized = re.sub(r"\s+", " ", TEMPLATE)
    tpl = jinja2.Environment().from_string(linearized)

    rows = open(f"{BASE}/check/rows.tsv").read().splitlines()
    header = rows[0].split("\t")
    expected = []
    for line in rows[1:]:
        rec = dict(zip(header, line.split("\t")))
        # the YAML operation chain
        rec["attended"] = {"TRUE": "absent", "FALSE": "present"}[rec["attended"]]
        rec["status"] = rec.pop("attended")
        rec["school"] = 12345
        expected.append(tpl.render(**rec))

    actual = open(f"{BASE}/check/lines.txt").read().splitlines()
    exp_s, act_s = sorted(expected), sorted(actual)
    if exp_s == act_s:
        print(f"[check_bigatt] PARITY OK: {len(actual)} sampled lines match "
              f"python-Jinja2 rendering exactly")
        return 0
    print(f"[check_bigatt] MISMATCH: expected {len(exp_s)} lines, got {len(act_s)}")
    for e, a in zip(exp_s, act_s):
        if e != a:
            print(" expected:", e)
            print(" actual  :", a)
            break
    only_e = set(exp_s) - set(act_s)
    only_a = set(act_s) - set(exp_s)
    for x in list(only_e)[:3]:
        print(" only-expected:", x)
    for x in list(only_a)[:3]:
        print(" only-actual  :", x)
    return 1


if __name__ == "__main__":
    sys.exit(main())
