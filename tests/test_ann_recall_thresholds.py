"""ANN recall floors (round-9 verdict ask #7).

The recall GATES hash Spark against a DuckDB oracle that computes the
same algorithm — they catch implementation divergence, but a change
made consistently to both sides (fewer probes, coarser codebooks, a
bucketing bug mirrored into the oracle) would silently degrade recall
while staying hash-green. These tests pin the measured recall values
themselves, so a real retrieval regression fails an assertion, not a
vibe.

Measured baselines (2026-08-15, near-uniform synthetic embeddings —
honest recall is LOW by construction; see the gate docstrings):

    sf0.1 (20k vectors):  IVF single-probe 0.1, 3-probe 0.5,
                          PQ ADC 0.1, PQ reranked 0.3
    sf1   (200k vectors): IVF single-probe 0.1, 3-probe 0.6,
                          PQ ADC 0.0, PQ reranked 0.2

Floors sit AT the measured values at sf0.1 (any drop is a regression);
the cross-metric invariants (multi-probe beats single-probe, rerank
never hurts ADC) hold at every SF.
"""

import pytest

SF_DIR = "/root/testdata/sf0.1"


def _one(spark, name):
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    rows = REGISTRY[name].spark(spark, SF_DIR).collect()
    assert len(rows) == 1
    return rows[0].asDict()


@pytest.fixture(scope="module")
def recalls(spark):
    return {
        "ivf": _one(spark, "similarity_ann_recall"),
        "mp": _one(spark, "similarity_ann_recall_multiprobe"),
        "pq": _one(spark, "similarity_pq_recall"),
    }


def test_ivf_single_probe_floor(recalls):
    assert recalls["ivf"]["recall_at_10"] >= 0.1


def test_multiprobe_floor(recalls):
    assert recalls["mp"]["recall_at_10"] >= 0.5


def test_multiprobe_beats_single_probe(recalls):
    # the whole point of probing 3 cells instead of 1
    assert recalls["mp"]["recall_at_10"] > recalls["ivf"]["recall_at_10"]


def test_pq_rerank_floor(recalls):
    assert recalls["pq"]["recall_at_10_reranked"] >= 0.3


def test_pq_rerank_never_hurts_adc(recalls):
    assert (
        recalls["pq"]["recall_at_10_reranked"] >= recalls["pq"]["recall_at_10"]
    )


# ---------------------------------------------------------------------------
# Clustered regime (round-10, round-9 verdict #4): the uniform floors above
# are honest but insensitive (a floor of 0.1 barely regresses). On a
# mixture-of-Gaussians twin (tools/make_clustered_embeddings.py — 8 tight
# clusters aligned with the 8 IVF cells) recall sits where a WORKING IVF
# should: measured at sf0.1 with sigma 0.30 -> IVF single-probe 0.9,
# 3-probe 1.0, PQ ADC 0.1, PQ reranked 0.3; trained-codebook PQ
# (round-10 #4: Lloyd-refined, 128 cents/subspace, 1000-deep rerank)
# ADC 0.3, reranked 1.0 (sf1: 0.1 / 1.0). Here a bucketing, assignment,
# or probing bug craters the number instead of nudging it. The uniform
# floors stay as the adversarial case.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def clustered_recalls(spark, tmp_path_factory):
    from tools.make_clustered_embeddings import make_clustered_dir

    d = make_clustered_dir(
        SF_DIR, str(tmp_path_factory.mktemp("clustered") / "sf")
    )
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    out = {}
    for key, name in [
        ("ivf", "similarity_ann_recall"),
        ("mp", "similarity_ann_recall_multiprobe"),
        ("pq", "similarity_pq_recall"),
        ("pq_trained", "similarity_pq_recall_trained"),
    ]:
        rows = REGISTRY[name].spark(spark, d).collect()
        assert len(rows) == 1
        out[key] = rows[0].asDict()
    return out


def test_clustered_ivf_floor(clustered_recalls):
    assert clustered_recalls["ivf"]["recall_at_10"] >= 0.9


def test_clustered_multiprobe_floor(clustered_recalls):
    assert clustered_recalls["mp"]["recall_at_10"] >= 1.0


def test_clustered_multiprobe_beats_single(clustered_recalls):
    assert (
        clustered_recalls["mp"]["recall_at_10"]
        > clustered_recalls["ivf"]["recall_at_10"]
    )


def test_clustered_pq_rerank_floor(clustered_recalls):
    assert clustered_recalls["pq"]["recall_at_10_reranked"] >= 0.3


def test_clustered_trained_pq_rerank_floor(clustered_recalls):
    """Round-10 verdict #4: the SAMPLED-codebook floor of 0.3 is too
    loose to catch a real ADC bug. The trained codebook (Lloyd-refined,
    128 centroids/subspace, 1000-deep rerank — measured 1.0 on this
    fixture, deterministic: no RNG anywhere in train/encode/scan) pins
    a floor of 0.9 with one recall-step of margin."""
    assert clustered_recalls["pq_trained"]["recall_at_10_reranked"] >= 0.9


def test_clustered_trained_beats_sampled(clustered_recalls):
    # the point of training: on clustered data the refined codebook must
    # strictly out-rank the frozen sampled one
    assert (
        clustered_recalls["pq_trained"]["recall_at_10_reranked"]
        > clustered_recalls["pq"]["recall_at_10_reranked"]
    )


_SF1_DIR = __import__("os").path.join(
    __import__("os").path.dirname(
        __import__("os").path.dirname(__import__("os").path.abspath(__file__))
    ),
    "testdata_sf1",
)


@pytest.mark.skipif(
    # anchored to the repo root, not the CWD (round-11 ADVICE #4: a
    # relative check silently skips when pytest runs from elsewhere)
    not __import__("os").path.isdir(_SF1_DIR),
    reason="sf1 fixture not built in this checkout",
)
def test_clustered_trained_pq_floor_sf1(spark, tmp_path_factory):
    """The trained-PQ floor must hold at 10x the vectors (round-10 #4
    'Done' criterion: green at sf0.1 AND sf1): 200k clustered vectors,
    measured reranked recall 1.0 — the 1000-deep rerank covers the
    within-cluster ADC tie group at this density too."""
    from tools.make_clustered_embeddings import make_clustered_dir
    from market_microstructure_toolkit_spark.plans.queries import REGISTRY

    d = make_clustered_dir(
        _SF1_DIR, str(tmp_path_factory.mktemp("clustered_sf1") / "sf")
    )
    rows = REGISTRY["similarity_pq_recall_trained"].spark(spark, d).collect()
    assert rows[0]["recall_at_10_reranked"] >= 0.9


def test_clustered_pq_rerank_never_hurts_adc(clustered_recalls):
    assert (
        clustered_recalls["pq"]["recall_at_10_reranked"]
        >= clustered_recalls["pq"]["recall_at_10"]
    )
