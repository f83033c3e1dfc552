"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library code it calls) invokes ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize the
    north-rule page table from the documents corpus, extract+validate
    text from html (byte-identity invariant), build the inverted index,
    and batch-evaluate the fixed BM25 query set."""
    import ray.data

    from neural_search_ray.config import IndexConfig
    from neural_search_ray.corpus.extract import extract_text_stage
    from neural_search_ray.corpus.generator import make_pages_from_documents
    from neural_search_ray.index.build import build_index
    from neural_search_ray.pipelines.suite import QUERY_SET, BM25_K
    from neural_search_ray.query.engine import SearchStage

    import pyarrow.parquet as pq
    import tempfile

    sf_dir = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    pages = make_pages_from_documents(docs)

    index_dir = tempfile.mkdtemp(prefix="nsr_entry_")
    ds = ray.data.from_arrow(pages).map_batches(
        extract_text_stage, batch_format="pyarrow"
    )
    build_index(ds, index_dir, IndexConfig(num_shards=4, num_salts=2))

    queries_ds = ray.data.from_items(
        [{"query_id": qid, "query_text": q} for qid, q in QUERY_SET]
    )
    return queries_ds.map_batches(
        SearchStage,
        fn_constructor_kwargs=dict(index_dir=index_dir, k=BM25_K),
        concurrency=1,
        batch_format="pyarrow",
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from neural_search_ray.pipelines.suite import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from neural_search_ray.pipelines.suite import build_oracle_sql

    return build_oracle_sql()
