"""Driver-contract registry invariants: queries() and oracle_sql() must
stay in lockstep — a query without an oracle silently downgrades the
driver's gate to rows-only, and a dangling oracle key is dead code."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E


def test_every_query_has_an_oracle():
    q = set(E.queries().keys())
    o = set(E.oracle_sql().keys())
    assert q - o == set(), "queries missing oracle SQL: {}".format(sorted(q - o))
    assert o - q == set(), "dangling oracle keys: {}".format(sorted(o - q))


def _last_green_from_artifacts(names):
    """Independent re-implementation of the front-load rule: last round a
    query was driver-attested fully green (rows+schema+hash, no err),
    plus the set of queries the driver ever attempted at all."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last = {n: 0 for n in names}
    attempted = set()
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(p)).group(1))
        for k, v in json.load(open(p)).items():
            if k not in last:
                continue
            attempted.add(k)
            if (v.get("rows_match") and v.get("schema_match")
                    and v.get("hash_match", True) and not v.get("err")):
                last[k] = max(last[k], rnd)
    return last, attempted


def test_registry_orders_least_recently_attested_first():
    """The driver samples 50 of the registered queries and insertion
    order is the only lever; registry order must be exactly
    (last-green-round asc, attempted-red-before-never-attempted,
    name asc) so red rows re-attest the round after their fix, new
    queries follow, and long-green cohorts rotate back in as the
    registry grows past 50."""
    names = list(E.queries().keys())
    last, attempted = _last_green_from_artifacts(names)
    key = lambda n: (last[n],
                     0 if (last[n] == 0 and n in attempted) else 1, n)
    assert names == sorted(names, key=key)
    # never-green queries (new or red last round) must lead the file,
    # with the driver-attempted-and-red ones at the very front
    never = [n for n in names if last[n] == 0]
    assert set(names[: len(never)]) == set(never)
    red = sorted(n for n in never if n in attempted)
    assert names[: len(red)] == red


def test_oracles_are_nonempty_sql():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
