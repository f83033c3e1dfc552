"""Runtime fields (query/runtime_fields.py)."""

import numpy as np
import pyarrow as pa
import pytest


class _FakeDV:
    """Minimal doc-values stand-in: sorted doc_ids + an Arrow table."""

    def __init__(self, doc_ids, **cols):
        self.doc_ids = np.asarray(doc_ids, dtype=np.int64)
        self.table = pa.table({k: pa.array(v) for k, v in cols.items()})


@pytest.fixture()
def dv():
    return _FakeDV([1, 3, 5, 7], n_chars=[100, 250, 399, 400])


@pytest.fixture(autouse=True)
def field(dv):
    from neural_search_ray.query.runtime_fields import register_runtime_field

    def kernel(src):
        v = src["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return v - v % 200

    register_runtime_field("t_bucket", ["n_chars"], kernel, overwrite=True)


class TestRuntimeFields:
    def test_column_and_cache(self, dv):
        from neural_search_ray.query import runtime_fields as rf

        v1 = rf.runtime_column(dv, "t_bucket")
        assert v1.tolist() == [0, 200, 200, 400]
        assert rf.runtime_column(dv, "t_bucket") is v1  # cached

    def test_cache_is_per_instance(self, dv):
        """The computed-column cache lives ON the DocValues instance
        (dies with it); a different instance — which in the old
        id(dv)-keyed module cache could alias a freed id — computes
        its own values."""
        from neural_search_ray.query import runtime_fields as rf

        v1 = rf.runtime_column(dv, "t_bucket")
        assert "t_bucket" in dv._runtime_cache
        other = _FakeDV([2, 4], n_chars=[50, 700])
        v2 = rf.runtime_column(other, "t_bucket")
        assert v2.tolist() == [0, 600]
        assert v2 is not v1
        assert rf.runtime_column(dv, "t_bucket") is v1

    def test_accepted(self, dv):
        from neural_search_ray.query.runtime_fields import accepted_runtime

        assert accepted_runtime(dv, "t_bucket", "==", 200).tolist() == [3, 5]
        assert accepted_runtime(dv, "t_bucket", ">=", 200).tolist() == [3, 5, 7]

    def test_lookup(self, dv):
        from neural_search_ray.query.runtime_fields import runtime_lookup

        assert runtime_lookup(dv, "t_bucket", np.array([7, 1])).tolist() == [400, 0]

    def test_terms_agg(self, dv):
        from neural_search_ray.query.runtime_fields import terms_agg_runtime

        vals, cnts = terms_agg_runtime(dv, "t_bucket")
        assert vals.tolist() == [0, 200, 400]
        assert cnts.tolist() == [1, 2, 1]

    def test_errors(self, dv):
        from neural_search_ray.query import runtime_fields as rf

        with pytest.raises(KeyError):
            rf.runtime_column(dv, "nope")
        with pytest.raises(ValueError):
            rf.accepted_runtime(dv, "t_bucket", "~", 1)
        with pytest.raises(ValueError):
            rf.register_runtime_field("t_bucket", ["n_chars"], lambda s: s)
        def bad(src):
            return np.array([1])
        rf.register_runtime_field("t_bad", ["n_chars"], bad, overwrite=True)
        with pytest.raises(ValueError, match="returned"):
            rf.runtime_column(dv, "t_bad")


class TestFieldCaps:
    """_field_caps introspection (query/fieldcaps.py)."""

    def test_caps_over_real_index(self, sf_dir, ray_session, tmp_path_factory):
        import ray

        from neural_search_ray.config import IndexConfig
        from neural_search_ray.index.build import build_index
        from neural_search_ray.index.docvalues import build_doc_values
        from neural_search_ray.query.engine import IndexSearcher
        from neural_search_ray.query.fieldcaps import field_caps

        d = str(tmp_path_factory.mktemp("caps_idx"))
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        build_index(ds, d, IndexConfig(num_shards=2, num_salts=2))
        build_doc_values(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet",
                columns=["doc_id", "lang", "n_chars"],
            ),
            d,
            num_shards=2,
        )
        caps = field_caps(IndexSearcher(d))
        assert caps["text"]["searchable"] is True
        assert caps["lang"] == {
            "type": "keyword", "searchable": False, "aggregatable": True,
            "filterable": True, "source": "doc_values",
        }
        assert caps["n_chars"]["type"] == "long"
        # registered runtime fields surface with their dependency list
        assert caps["t_bucket"]["source"] == "runtime"
        assert caps["t_bucket"]["depends_on"] == ["n_chars"]

    def test_caps_without_docvalues(self, sf_dir, ray_session, tmp_path_factory):
        import ray

        from neural_search_ray.config import IndexConfig
        from neural_search_ray.index.build import build_index
        from neural_search_ray.query.engine import IndexSearcher
        from neural_search_ray.query.fieldcaps import field_caps

        d = str(tmp_path_factory.mktemp("caps_nodv"))
        build_index(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ),
            d,
            IndexConfig(num_shards=2, num_salts=2),
        )
        caps = field_caps(IndexSearcher(d))
        assert caps["text"]["source"] == "index"
        assert "lang" not in caps


class TestValidateQuery:
    """_validate/query parse-only validation (query/validate.py)."""

    def test_dsl(self):
        from neural_search_ray.query.validate import validate_query

        assert validate_query({"query": {"match": {"text": "x"}}}) == {
            "valid": True, "error": None,
        }
        assert not validate_query({"query": {"knn": {}}})["valid"]
        assert not validate_query({"query": {}})["valid"]
        assert not validate_query("nope")["valid"]

    def test_query_string(self):
        from neural_search_ray.query.validate import validate_query

        assert validate_query(
            "data AND (query OR merge)", kind="query_string"
        )["valid"]
        bad = validate_query("(data", kind="query_string")
        assert not bad["valid"] and "')'" in bad["error"]

    def test_esql(self):
        from neural_search_ray.query.validate import validate_query

        assert validate_query(
            "FROM t | STATS n = COUNT(*) BY k", kind="esql"
        )["valid"]
        assert not validate_query("FROM t | LIMIT x", kind="esql")["valid"]

    def test_unknown_kind(self):
        from neural_search_ray.query.validate import validate_query

        assert not validate_query("x", kind="sql")["valid"]
