"""Pure-Python twin for rocchio_feedback."""

import duckdb
import numpy as np

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def _emb():
    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, embedding::DOUBLE[] FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    return {vid: np.asarray(v, dtype=np.float64) for vid, v in rows}


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_rocchio_matches_python_twin(spark):
    emb = _emb()
    qv = emb[0]
    cands = {v: e for v, e in emb.items() if v != 0}
    pool = sorted(
        ((round(_cos(e, qv), 4), v) for v, e in cands.items()),
        key=lambda r: (-r[0], r[1]),
    )[: DQ._ROCCHIO_POOL]
    rel_vecs, non_vecs = [], []
    for _c, v in pool:
        if ((v % DQ._SPLIT_PRIME) * 2654435761) % 4 >= 2:
            rel_vecs.append(cands[v])
        else:
            non_vecs.append(cands[v])
    dim = len(qv)
    crel = (
        np.mean(rel_vecs, axis=0) if rel_vecs else np.zeros(dim)
    )
    cnon = (
        np.mean(non_vecs, axis=0) if non_vecs else np.zeros(dim)
    )
    qp = (
        DQ._ROCCHIO_A * qv + DQ._ROCCHIO_B * crel - DQ._ROCCHIO_G * cnon
    )
    want = sorted(
        ((v, round(_cos(e, qp), 4)) for v, e in cands.items()),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    got = [
        (r.vec_id, r.cos)
        for r in DQ.q_rocchio_feedback(spark, SF_DIR).collect()
    ]
    assert got == want
    assert rel_vecs and non_vecs  # fixture sanity: both classes non-empty


def test_rocchio_moves_ranking_toward_relevant(spark):
    """Feedback must not decrease the share of pseudo-relevant docs in the
    top-10 relative to the plain cosine ranking (Rocchio's whole point),
    and the re-ranked scores stay valid cosines."""
    emb = _emb()
    qv = emb[0]
    cands = {v: e for v, e in emb.items() if v != 0}

    def relfrac(ranked):
        return sum(
            1
            for v in ranked
            if ((v % DQ._SPLIT_PRIME) * 2654435761) % 4 >= 2
        )

    base = [
        v
        for _c, v in sorted(
            ((round(_cos(e, qv), 4), v) for v, e in cands.items()),
            key=lambda r: (-r[0], r[1]),
        )[:10]
    ]
    rows = DQ.q_rocchio_feedback(spark, SF_DIR).collect()
    fed = [r.vec_id for r in rows]
    assert relfrac(fed) >= relfrac(base)
    for r in rows:
        assert -1.0 - 1e-9 <= r.cos <= 1.0 + 1e-9
