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


def test_registry_front_loads_unattested_queries():
    """The driver samples 50 of the registered queries and insertion
    order is the only lever; the four audio queries that had never been
    driver-attested through round 3 must stay at the head."""
    names = list(E.queries().keys())
    assert set(names[:4]) == {"audio_segment", "audio_wav_validate",
                              "audio_embed_ann", "audio_normalize"}


def test_oracles_are_nonempty_sql():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
