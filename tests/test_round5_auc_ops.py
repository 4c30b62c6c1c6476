"""Pure-Python twin for the round-5 closing batch 22: rfm_churn_auc."""

from collections import defaultdict

import duckdb

from search_engine_spark import driver_queries as DQ

SF_DIR = "/root/testdata/sf0.001"


def test_rfm_churn_auc_matches_twin(spark):
    rows = duckdb.connect().execute(
        f"SELECT user_id, epoch_us(ts) "
        f"FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    end = max(us for _u, us in rows)
    cut = end - DQ._AUC_CHURN_DAYS * 86_400_000_000
    pre = defaultdict(lambda: None)
    post = defaultdict(bool)
    for u, us in rows:
        if us < cut:
            if pre[u] is None or us > pre[u]:
                pre[u] = us
        else:
            post[u] = True
    users = [
        (u, end - pre[u], 0 if post[u] else 1)
        for u in pre if pre[u] is not None
    ]
    ranked = sorted(users, key=lambda r: (r[1], r[0]))
    n_pos = sum(c for _u, _r, c in users)
    n_neg = len(users) - n_pos
    r_pos = sum(
        i for i, (_u, _rec, c) in enumerate(ranked, start=1) if c
    )
    u_stat = r_pos - n_pos * (n_pos + 1) // 2
    auc = u_stat / (n_pos * n_neg)
    r = DQ.q_rfm_churn_auc(spark, SF_DIR).collect()[0]
    assert (r.n_pos, r.n_neg, r.u_stat) == (n_pos, n_neg, u_stat)
    assert r.auc == round(auc, 4)
    # the U statistic lives in [0, n_pos * n_neg]; AUC in [0, 1]
    assert 0 <= r.u_stat <= n_pos * n_neg
    assert 0.0 <= r.auc <= 1.0


def test_auc_identity_on_perfect_separation():
    # closed-form sanity: if every positive ranks above every negative,
    # U = n_pos * n_neg exactly -> AUC = 1
    n_pos, n_neg = 4, 6
    r_pos = sum(range(n_neg + 1, n_neg + n_pos + 1))
    u = r_pos - n_pos * (n_pos + 1) // 2
    assert u == n_pos * n_neg
