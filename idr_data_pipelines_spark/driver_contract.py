"""Single source of truth for the driver-harness contract constants.

The correctness driver registers the same ten parquet tables as DuckDB
views, runs each registry oracle with ``execute(sql).df()``, and keeps
the whole 50-query window in ONE process — so every local mirror of
that behavior (tests/oracle_harness.py, tools/window_sweep.py,
tools/oracle_map_profile.py, tools/rotate_window.py) must agree on the
table list and on the memory-mapping budgets. Before this module they
each carried their own copy; a drifted copy makes a gate pass locally
on a table set the driver doesn't use — the local-vs-driver divergence
class r07/r08 kept re-finding.
"""

from __future__ import annotations

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Map-budget doctrine (r08 post-mortem): the driver's shared process
# accumulates DuckDB buffer blocks (one mmap each) toward the kernel's
# vm.max_map_count (65,530 on the reference host). No single oracle
# may retain more than PER_ORACLE_MAP_BUDGET mappings in a fresh
# connection, and a staged window's shared-connection sweep must keep
# the live map count under WINDOW_MAP_BUDGET at every position.
PER_ORACLE_MAP_BUDGET = 2000
WINDOW_MAP_BUDGET = 30000


def create_views(con, sf_dir: str) -> None:
    """Register the driver's table views on a DuckDB connection."""
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
