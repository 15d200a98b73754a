import os

import pytest
import ray


@pytest.fixture(scope="session")
def ray_session():
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus_dir(tmp_path_factory):
    from nadry_search_engine_be_ray.sources.corpus import write_corpus

    d = tmp_path_factory.mktemp("corpus")
    write_corpus(str(d), n_docs=300, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def built_index(ray_session, tiny_corpus_dir, tmp_path_factory):
    from nadry_search_engine_be_ray.config import BuildConfig
    from nadry_search_engine_be_ray.pipelines.build import build_index

    index_dir = str(tmp_path_factory.mktemp("index"))
    cfg = BuildConfig(num_shards=4, salt_bits=1)
    build_index(tiny_corpus_dir, index_dir, cfg)
    return index_dir


@pytest.fixture(scope="session")
def oracle_index(tiny_corpus_dir):
    import pyarrow.dataset as pads

    from nadry_search_engine_be_ray.oracle import OracleIndex

    table = pads.dataset(tiny_corpus_dir, format="parquet").to_table()
    idx = OracleIndex()
    idx.add_corpus(table)
    return idx
