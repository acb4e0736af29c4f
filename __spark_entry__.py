"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in
``news_information_retrieval_system_spark.entry_queries``; this module
stays a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from news_information_retrieval_system_spark import entry_queries as EQ  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_batch3 as EQ3  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_ops as EQO  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_r2 as EQR2  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_r3 as EQR3  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_r4 as EQR4  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_ltr as EQLTR  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_topics as EQTOP  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_feedback as EQFB  # noqa: E402
from news_information_retrieval_system_spark import entry_queries_termcluster as EQTC  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: build the full-text index over sf0.001 documents and
    answer the fixed BM25 query batch (top-10 per query)."""
    return EQ.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        **EQ.registry(),
        **EQO.registry(),
        **EQ3.registry(),
        **EQR2.registry(),
        **EQR3.registry(),
        **EQR4.registry(),
        **EQLTR.registry(),
        **EQTOP.registry(),
        **EQFB.registry(),
        **EQTC.registry(),
    }


def oracle_sql() -> dict[str, str]:
    return {
        **EQ.ORACLES,
        **EQO.ORACLES,
        **EQ3.ORACLES,
        **EQR2.ORACLES,
        **EQR3.ORACLES,
        **EQR4.ORACLES,
        **EQLTR.ORACLES,
        **EQTOP.ORACLES,
        **EQFB.ORACLES,
        **EQTC.ORACLES,
    }
