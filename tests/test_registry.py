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
    query was driver-attested fully green (rows+schema+hash, no err)."""
    import glob
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last = {n: 0 for n in names}
    for p in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(p)).group(1))
        for k, v in json.load(open(p)).items():
            if (k in last and v.get("rows_match") and v.get("schema_match")
                    and v.get("hash_match", True) and not v.get("err")):
                last[k] = max(last[k], rnd)
    return last


def test_registry_orders_least_recently_attested_first():
    """The driver samples 50 of the registered queries and insertion
    order is the only lever; registry order must be exactly
    (last-green-round asc, name asc) so never-attested and red-last-round
    queries land in the sample and long-green cohorts rotate back in as
    the registry grows past 50."""
    names = list(E.queries().keys())
    last = _last_green_from_artifacts(names)
    assert names == sorted(names, key=lambda n: (last[n], n))
    # never-green queries (new or red last round) must lead the file
    never = [n for n in names if last[n] == 0]
    assert names[: len(never)] == sorted(never)


def test_oracles_are_nonempty_sql():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
