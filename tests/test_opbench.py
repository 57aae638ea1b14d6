"""The production-operator bench battery (plans/opbench.py) must stay
runnable: bench.py executes every OPERATOR_BENCH callable per pass, so
a broken entry would silently cost the round its operator perf
signal."""

from __future__ import annotations

from csce438_distributed_password_cracker_spark.plans import opbench


def test_operator_bench_entries_run(spark, sf_smoke):
    assert set(opbench.OPERATOR_BENCH) == {
        "paragraph_dedup",
        "semantic_dedup",
        "shuffle_rows",
        "pack_sequences",
        "bm25_build",
        "substring_dedup",
        "lm_score",
        "clf_score",
        "dsir_select",
        "bpe_encode",
        "export_shards",
        "langid_classify",
        "paradedup_ingest_build",
        "paradedup_ingest_probe",
        "substring_ingest_build",
        "substring_ingest_probe",
        "bm25_ingest_probe",
        "grouped_heavy_hitters",
        "fit_pca",
        "pca_project",
    }
    for name, fn in sorted(opbench.OPERATOR_BENCH.items()):
        fn(spark, sf_smoke)  # must execute end-to-end without raising


def test_bm25_build_tears_down_its_index(spark, sf_smoke):
    from csce438_distributed_password_cracker_spark.plans.pipeline_queries import (
        warehouse_root_tag,
    )

    wh, tag = warehouse_root_tag(sf_smoke)
    before = set(wh.glob(f"opbench_bm25_{tag}_*"))
    opbench.bench_bm25_build(spark, sf_smoke)
    after = set(wh.glob(f"opbench_bm25_{tag}_*"))
    assert after == before  # fresh-per-run build leaves no litter
