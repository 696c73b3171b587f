#!/usr/bin/env python
"""Full-coverage correctness mirror: run EVERY declared query and its
DuckDB oracle at the driver's comparison SF (sf0.01) and emit one JSON
line — the per-round ``MIRROR_r{N}.json`` artifact, same schema as
``SF1_MIRROR_r{N}.json``.

This is the 199+-query coverage number that previously lived only
inside the pytest run (tests/test_declared_queries.py); as a tools/
entry point it becomes a first-class round artifact like CORRECTNESS
and BENCH. Usage:

    python tools/mirror.py > MIRROR_r10.json

Environment overrides (shared with tools/sf1_mirror.py, which this
wraps): SPARK_GRAFT_SF1_DIR (default here: /root/testdata/sf0.01),
SPARK_GRAFT_SF1_SCOPE (default here: all), SPARK_GRAFT_SF1_ORACLE_CAP.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF1_DIR", "/root/testdata/sf0.01")
os.environ.setdefault("SPARK_GRAFT_SF1_SCOPE", "all")

if __name__ == "__main__":
    # import AFTER the env defaults — sf1_mirror reads them at import
    import tools.sf1_mirror as m

    m.main()
