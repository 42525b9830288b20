from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from kglinker.runtime.session import get_spark
    s = get_spark("kglinker-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def kb_scored(spark):
    from kglinker.data.kb_fixture import kb_df
    from kglinker.kb.scoring import score_kb
    return score_kb(kb_df(spark)).cache()


@pytest.fixture(scope="session")
def artifacts(spark, kb_scored):
    """Compiled KB artifacts (local object, not broadcast)."""
    from kglinker.automaton.build import build_artifacts
    from kglinker.kb.names import build_namelist, build_subname_map
    nl = build_namelist(kb_scored)
    sub = build_subname_map(kb_scored)
    from kglinker.automaton.build import KB_PROJECTION_COLS
    return build_artifacts(
        [r.asDict() for r in kb_scored.select(*KB_PROJECTION_COLS).collect()],
        [r.asDict() for r in nl.collect()],
        [r.asDict() for r in sub.collect()],
    )


@pytest.fixture(scope="session")
def artifacts_bcast(spark, artifacts):
    return spark.sparkContext.broadcast(artifacts)


@pytest.fixture(scope="session")
def oracle_linker(spark, kb_scored):
    """Independent mention-stage oracle: raw KB rows + the collected
    namelist/subname build artifacts (data, not engine code)."""
    from kglinker.data.kb_fixture import kb_rows_as_dicts
    from kglinker.kb.names import build_namelist, build_subname_map
    from kglinker.oracle_matcher import OracleLinker
    nl = [r.asDict() for r in build_namelist(kb_scored).collect()]
    sub = [r.asDict() for r in build_subname_map(kb_scored).collect()]
    return OracleLinker(kb_rows_as_dicts(), nl, sub)
