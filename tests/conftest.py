"""Session-scoped Ray fixture: ONE ray.init per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from jochre3_ocr_ray.config import configure_context

    configure_context()
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus(tmp_path_factory):
    """Deterministic ~400-turn shuffled transcript corpus on disk."""
    from jochre3_ocr_ray.sources.corpus import generate_transcripts

    out = tmp_path_factory.mktemp("corpus")
    generate_transcripts(400, out, seed=11, num_files=4)
    return out


@pytest.fixture(scope="session")
def lexicon():
    from jochre3_ocr_ray.functions.lexicon import Lexicon

    return Lexicon.load()
