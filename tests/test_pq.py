"""Product-quantized dense tier (ann/pq.py): trainer determinism,
codec geometry, ADC window recall, and rescore exactness."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from neural_search_ray.ann.pq import (
    adc_tables,
    encode_pq,
    knn_pq,
    knn_pq_rescore,
    train_pq_codebooks,
)

N, DIM = 400, 16


def _corpus(seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(N, DIM))


M, KS = 8, 16  # dsub=2: the fidelity the gaussian corpus needs for
# window recall (m=4 on unstructured vectors leaves the exact top-10
# outside an 80-wide ADC window — measured, not assumed)


@pytest.fixture(scope="module")
def pq(ray_session):
    vecs = _corpus()
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(N), pa.int64()),
                "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
            }
        )
    ).repartition(4)
    books = train_pq_codebooks(ds, m=M, ks=KS, sample_size=256, seed=1)
    return ds, vecs, books


def test_trainer_deterministic_and_shaped(pq):
    ds, _, books = pq
    assert books.shape == (M, KS, DIM // M)
    again = train_pq_codebooks(ds, m=M, ks=KS, sample_size=256, seed=1)
    assert np.array_equal(books, again)
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(ds, m=5)


def test_encode_codes_are_nearest_centroids(pq):
    _, vecs, books = pq
    codes = encode_pq(vecs[:50], books)
    assert codes.shape == (50, M) and codes.dtype == np.uint8
    dsub = DIM // M
    unit = vecs[:50] / np.linalg.norm(vecs[:50], axis=1)[:, None]
    for j in range(M):
        x = unit[:, j * dsub : (j + 1) * dsub]
        d = ((x[:, None, :] - books[j][None]) ** 2).sum(axis=2)
        assert np.array_equal(codes[:, j], np.argmin(d, axis=1).astype(np.uint8))


def test_adc_score_equals_lut_sum(pq):
    _, vecs, books = pq
    q = vecs[:2]
    luts = adc_tables(q, books)
    codes = encode_pq(vecs[:10], books)
    # ADC score must equal unit_q · reconstructed(codes)
    recon = np.concatenate(
        [books[j][codes[:, j]] for j in range(M)], axis=1
    )
    unit_q = q / np.linalg.norm(q, axis=1)[:, None]
    want = unit_q @ recon.T
    got = np.stack(
        [
            sum(luts[qi, j, codes[:, j]] for j in range(M))
            for qi in range(2)
        ]
    )
    assert np.allclose(got, want, atol=1e-12)


def test_window_recall_and_rescore_exactness(pq):
    """The suite's correctness contract: at oversample=8 the exact
    top-10 must sit inside the ADC window, so the rescored top-10
    equals brute-force cosine exactly (ranks AND scores)."""
    ds, vecs, books = pq
    queries, qids = vecs[:3], np.arange(3)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    uq = queries / np.linalg.norm(queries, axis=1)[:, None]
    sims = uq @ unit.T

    def fetch(ids):
        return ids, vecs[np.asarray(ids, dtype=np.int64)]

    out = knn_pq_rescore(ds, queries, qids, books, fetch, k=10, oversample=8)
    for qi in range(3):
        exact = np.lexsort((np.arange(N), -sims[qi]))[:10]
        got = out.filter(
            pa.compute.equal(out["query_id"], qi)
        )
        assert got["neighbor_id"].to_numpy().tolist() == exact.tolist()
        assert np.allclose(
            got["score"].to_numpy(), sims[qi][exact], atol=1e-12
        )


def test_adc_window_recall_floor(pq):
    """Raw ADC quality floor: recall@(10→80 window) = 1.0 on this
    corpus (what the suite oversample relies on), and raw top-10 ADC
    recall is itself well above chance."""
    ds, vecs, books = pq
    queries, qids = vecs[5:8], np.arange(3)
    unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    uq = queries / np.linalg.norm(queries, axis=1)[:, None]
    sims = uq @ unit.T
    cand = knn_pq(ds, queries, qids, books, k=80)
    raw10 = knn_pq(ds, queries, qids, books, k=10)
    recalls = []
    for qi in range(3):
        exact = set(np.argsort(-sims[qi])[:10].tolist())
        win = set(
            cand.filter(pa.compute.equal(cand["query_id"], qi))[
                "neighbor_id"
            ].to_numpy().tolist()
        )
        assert exact <= win, f"query {qi}: exact top-10 escapes the window"
        top = set(
            raw10.filter(pa.compute.equal(raw10["query_id"], qi))[
                "neighbor_id"
            ].to_numpy().tolist()
        )
        recalls.append(len(exact & top) / 10)
    assert np.mean(recalls) >= 0.5, recalls


def test_empty_and_tiny_corpus(ray_session, pq):
    _, vecs, books = pq
    tiny = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([7], pa.int64()),
                "embedding": pa.array([vecs[7].tolist()], pa.list_(pa.float64())),
            }
        )
    )
    out = knn_pq(tiny, vecs[:1], np.array([0]), books, k=10)
    assert out.num_rows == 1 and out["neighbor_id"][0].as_py() == 7


class TestBinaryBBQ:
    """Binary-quantized two-phase kNN (ann/binary.py)."""

    def test_pack_bits(self):
        import numpy as np

        from neural_search_ray.ann.binary import pack_bits

        v = np.array([[1.0, -1.0, 0.0, -0.5, 2.0, -2.0, 3.0, -3.0]])
        # bits: 1 0 1 0 1 0 1 0 -> 0b10101010
        assert pack_bits(v).tolist() == [[0b10101010]]

    def test_hamming_matrix(self):
        import numpy as np

        from neural_search_ray.ann.binary import hamming_matrix, pack_bits

        a = pack_bits(np.array([[1.0, 1.0, 1.0, 1.0, -1, -1, -1, -1]]))
        b = pack_bits(np.array(
            [[1.0, 1.0, 1.0, 1.0, -1, -1, -1, -1],
             [-1.0, -1, -1, -1, 1, 1, 1, 1],
             [1.0, -1, 1, -1, 1, -1, 1, -1]]
        ))
        assert hamming_matrix(a, b).tolist() == [[0, 8, 4]]

    def test_rescore_matches_manual(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from neural_search_ray.ann.binary import (
            hamming_matrix, knn_binary_rescore, pack_bits,
        )

        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(200, 16))
        ids = np.arange(200)
        queries = vecs[:2].copy()
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }))
        out = knn_binary_rescore(ds, queries, np.array([0, 1]), k=5,
                                 candidates=30)
        # manual window + rescore
        ham = hamming_matrix(pack_bits(queries), pack_bits(vecs))
        for qi in (0, 1):
            win = np.lexsort((ids, ham[qi]))[:30]
            cos = (vecs[win] @ queries[qi]) / (
                np.linalg.norm(vecs[win], axis=1)
                * np.linalg.norm(queries[qi])
            )
            exp = ids[win][np.lexsort((ids[win], -cos))[:5]]
            got = [r["neighbor_id"] for r in out.to_pylist()
                   if r["query_id"] == qi]
            assert got == exp.tolist()
        # the query vector itself is always rank 1 (hamming 0, cos 1)
        top = {r["query_id"]: r["neighbor_id"]
               for r in out.to_pylist() if r["rank"] == 1}
        assert top == {0: 0, 1: 1}

    def test_candidates_validation(self, ray_session):
        import numpy as np
        import pytest as _pytest

        from neural_search_ray.ann.binary import knn_binary_rescore

        with _pytest.raises(ValueError):
            knn_binary_rescore(None, np.zeros((1, 8)), np.array([0]),
                               k=10, candidates=5)


class TestMaxSim:
    """Late-interaction maxSim (ann/latei.py)."""

    def test_scores_match_manual(self):
        import numpy as np

        from neural_search_ray.ann.latei import maxsim_scores

        rng = np.random.default_rng(3)
        q = rng.normal(size=(2, 3, 4))
        d = rng.normal(size=(5, 3, 4))
        got = maxsim_scores(q, d)
        for qi in range(2):
            for ni in range(5):
                exp = sum(
                    max(float(q[qi, a] @ d[ni, b]) for b in range(3))
                    for a in range(3)
                )
                assert abs(got[qi, ni] - exp) < 1e-12

    def test_knn_maxsim_self_is_top(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from neural_search_ray.ann.latei import knn_maxsim

        rng = np.random.default_rng(11)
        vecs = rng.normal(size=(100, 32))
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
        }))
        queries = vecs[:3].reshape(3, 4, 8)
        out = knn_maxsim(ds, queries, np.array([0, 1, 2]), k=5, num_sub=4)
        top = {r["query_id"]: r["neighbor_id"]
               for r in out.to_pylist() if r["rank"] == 1}
        # maxSim(q, q) = sum of per-sub self dots, the max unless another
        # doc dominates every sub-vector — not the case for gaussians
        assert top == {0: 0, 1: 1, 2: 2}
        assert all(
            r1 >= r2 for r1, r2 in zip(
                [r["score"] for r in out.to_pylist() if r["query_id"] == 0],
                [r["score"] for r in out.to_pylist() if r["query_id"] == 0][1:],
            )
        )
