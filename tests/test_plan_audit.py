"""Global physical-plan audit: the anti-pattern guard over EVERY
registered query.

The 100 TB rules (README "Scale design") say: no cartesian products, and
Python only behind Arrow batching. Per-query pin tests check individual
claims; this audit closes the gap for every query added later — a new
entry that sneaks in a CartesianProduct or a row-at-a-time Python UDF
fails here by name.

Plans are built at sf0.001 so even the expensive similarity/graph
builders stay cheap; building the executed plan does not run the batch
job (streaming entries execute their bounded micro-runs, which is what
they do everywhere).
"""

from __future__ import annotations

import re

import pytest

from nzwirelessmap_fetch_spark.plans import registry
from tests.conftest import SF_SMOKE

# Arrow-batched Python operators — the sanctioned slow paths.
ALLOWED_PYTHON_NODES = {
    "ArrowEvalPython",        # vectorized scalar pandas UDF
    "FlatMapGroupsInPandas",  # grouped applyInPandas
    "MapInPandas",            # mapInPandas (multimodal, BLAS scoring)
    "FlatMapGroupsInPandasWithState",  # custom streaming state
    "BatchEvalPythonUDTF",    # Python UDTF (declared 1->N escape hatch)
}


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_no_cartesian_no_row_python(name, spark):
    plan = (
        registry.queries()[name](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    # \b keeps BatchEvalPythonUDTF (allowed) from matching the row-UDF node
    assert not re.search(r"\bBatchEvalPython\b", plan), (
        f"{name} plans a row-at-a-time Python UDF"
    )
    for node in re.findall(r"\b(\w*EvalPython\w*|\w*InPandas\w*)\b", plan):
        assert node in ALLOWED_PYTHON_NODES, f"{name}: unsanctioned Python node {node}"


def test_first_fifty_cover_every_operator_family():
    """The driver records correctness rows for the FIRST 50 registered
    queries only (suite_registration.py header). This pins the stated
    policy — at least one representative of every operator family inside
    the driver-checked window — so a future registration reorder cannot
    silently starve a family of hard signal."""
    names = list(registry.queries())[:50]

    def has(prefix: str) -> bool:
        return any(n.startswith(prefix) for n in names)

    families = {
        "flagship": "p2p_links" in names,
        "multimodal": has("multimodal_"),
        "streaming": has("stream_"),
        "aggregation": has("agg_"),
        "joins": has("join_"),
        "set ops": has("set_ops"),
        "windows": has("window_"),
        "merge/incremental": "merge_upsert" in names,
        "scalar funcs": all(n in names for n in ("string_funcs", "math_funcs", "json_funcs")),
        "python surfaces": "grouped_pandas_topk" in names and "text_udtf_tokens" in names,
        "dedup": has("dedup_"),
        "text analysis": has("text_"),
        "corpus curation": has("corpus_"),
        "similarity": has("sim_"),
        "as-of": has("asof_"),
        "sessionization": "sessionize" in names,
        "events analytics (incl. CEP)": has("events_"),
        "graph": has("graph_"),
        "packing": has("pack_"),
        "embeddings": has("embedding_"),
        "data quality / replica validation": "table_merkle_checksum" in names,
        "feature prep / model evals": has("ml_"),
    }
    missing = [fam for fam, ok in families.items() if not ok]
    assert not missing, f"families without a driver-checked representative: {missing}"
