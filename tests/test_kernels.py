"""Tests for the parity kernels: beam guesser, containment join,
grapheme split, language vote, sampling, extension hooks."""

from __future__ import annotations

import pytest

from jochre3_ocr_ray.functions.extract import dominant_language, extract_turn
from jochre3_ocr_ray.functions.geometry import Rectangle, place_in_containers
from jochre3_ocr_ray.functions.guesser import (
    Guess,
    beam_search,
    best_guess,
    rescore,
)
from jochre3_ocr_ray.functions.rules import string_to_chars


class TestBeamGuesser:
    def test_geometric_mean_score(self):
        g = Guess("ab", __import__("math").log(0.9) + __import__("math").log(0.4), 2)
        assert g.score == pytest.approx((0.9 * 0.4) ** 0.5)

    def test_beam_keeps_top_width(self):
        candidates = [[("a", 0.9), ("b", 0.5)], [("c", 0.8), ("d", 0.7)]]
        beam = beam_search(candidates, width=2)
        assert [g.text for g in beam] == ["ac", "ad"]

    def test_lexicon_rescoring_flips_winner(self, lexicon):
        # raw scores favour the unknown guess; rescoring x0.5 flips it
        candidates = [
            [("t", 0.8), ("z", 0.9)],
            [("h", 0.8), ("z", 0.9)],
            [("e", 0.8), ("z", 0.9)],
        ]
        text, _ = best_guess(candidates, lexicon, width=8)
        assert text == "the"

    def test_impossible_heavily_penalized(self, lexicon):
        g = Guess("abc123", 0.0, 6)
        assert rescore(g, lexicon) == pytest.approx(0.01)

    def test_tie_first_wins(self, lexicon):
        candidates = [[("x", 0.5), ("y", 0.5)]]
        beam = beam_search(candidates, width=2)
        assert beam[0].text == "x"


class TestContainmentJoin:
    def test_children_assigned_to_best_container(self):
        containers = [Rectangle(0, 0, 100, 50), Rectangle(0, 60, 100, 50)]
        children = [
            Rectangle(10, 5, 20, 10),    # inside container 0
            Rectangle(10, 65, 20, 10),   # inside container 1
            Rectangle(10, 45, 20, 20),   # straddles: 25% in c0, 25% in c1 -> dropped at 0.5
            Rectangle(500, 500, 10, 10), # orphan
        ]
        assigned = place_in_containers(
            children, containers, rect_of=lambda r: r, container_rect_of=lambda r: r
        )
        assert assigned[0] == [children[0]]
        assert assigned[1] == [children[1]]
        assert len(assigned) == 2

    def test_low_threshold_assigns_straddler(self):
        containers = [Rectangle(0, 0, 100, 50), Rectangle(0, 60, 100, 50)]
        child = Rectangle(10, 40, 20, 20)  # 50% in c0, 0% in c1
        assigned = place_in_containers(
            [child], containers, rect_of=lambda r: r,
            container_rect_of=lambda r: r, threshold=0.01,
        )
        assert assigned == {0: [child]}


class TestGraphemeSplit:
    def test_combining_marks_attached(self):
        decomposed = "éa"  # e + combining acute + a
        assert string_to_chars(decomposed) == ["é", "a"]

    def test_plain(self):
        assert string_to_chars("abc") == ["a", "b", "c"]
        assert string_to_chars("") == []


class TestDominantLanguage:
    def test_lang_column(self, lexicon):
        assert extract_turn("hello world", 0, lexicon)["lang"] == "latin"
        assert extract_turn("שלום עולם", 0, lexicon)["lang"] == "rtl"
        assert extract_turn("123 456", 0, lexicon)["lang"] == ""
        # majority vote: two rtl words vs one latin
        assert extract_turn("שלום עולם ok", 0, lexicon)["lang"] == "rtl"


class TestExtensionHooks:
    def test_custom_simplifier_and_segmenter(self, lexicon):
        from jochre3_ocr_ray.functions.segmenter import SegmentedBlock

        upper = lambda t: t.upper()
        one_block = lambda t: [SegmentedBlock(lines=[t])]
        r = extract_turn(
            "ab cd", 0, lexicon, simplifier=upper, segmenter=one_block
        )
        assert r["extracted_text"] == "AB CD"


class TestTrainValSplit:
    def test_deterministic_disjoint_split(self, ray_session):
        import ray.data as rd

        from jochre3_ocr_ray.sources.sampling import train_val_split

        ds = rd.from_items([{"k": i, "v": i * 2} for i in range(200)])
        train, val = train_val_split(ds, "k", every_nth=4)
        t1 = sorted(r["k"] for r in train.take_all())
        v1 = sorted(r["k"] for r in val.take_all())
        assert len(t1) + len(v1) == 200
        assert set(t1).isdisjoint(v1)
        assert 20 < len(v1) < 80  # ~25%
        # deterministic on re-run
        train2, val2 = train_val_split(ds, "k", every_nth=4)
        assert sorted(r["k"] for r in val2.take_all()) == v1


class TestFixedSizeSampling:
    def test_bottom_k_matches_brute_force_and_partitioning(self, ray_session):
        """bottom_k_sample is the deterministic reservoir analog: the
        result equals the brute-force n-smallest-hash set and is
        identical under different partitionings."""
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from jochre3_ocr_ray.sources.sampling import bottom_k_sample

        df = pd.DataFrame({"doc_id": np.arange(1000), "v": np.arange(1000) * 3})
        h = pd.util.hash_array(df["doc_id"].to_numpy(), categorize=False)
        want = set(df["doc_id"].to_numpy()[np.argsort(h)[:50]])
        got8 = bottom_k_sample(
            rd.from_pandas(df).repartition(8), 50, "doc_id"
        ).to_pandas()
        got3 = bottom_k_sample(
            rd.from_pandas(df).repartition(3), 50, "doc_id"
        ).to_pandas()
        assert set(got8["doc_id"]) == want
        assert set(got3["doc_id"]) == want
        assert list(got8.columns) == ["doc_id", "v"]  # hash col dropped
        # n larger than the corpus: everything survives
        small = rd.from_pandas(df.head(7))
        assert len(bottom_k_sample(small, 50, "doc_id").to_pandas()) == 7

    def test_stratified_exact_per_group(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from jochre3_ocr_ray.sources.sampling import stratified_sample

        df = pd.DataFrame(
            {"doc_id": np.arange(1000), "grp": np.arange(1000) % 7}
        )
        st = stratified_sample(
            rd.from_pandas(df).repartition(8), 5, "grp", "doc_id"
        ).to_pandas()
        assert sorted(st.groupby("grp").size().tolist()) == [5] * 7
        for g, sub in df.groupby("grp"):
            hh = pd.util.hash_array(sub["doc_id"].to_numpy(), categorize=False)
            want = set(sub["doc_id"].to_numpy()[np.argsort(hh)[:5]])
            assert set(st.loc[st.grp == g, "doc_id"]) == want
        # a group smaller than n keeps all its rows
        tiny = pd.DataFrame({"doc_id": [1, 2, 3], "grp": [0, 0, 1]})
        out = stratified_sample(
            rd.from_pandas(tiny), 5, "grp", "doc_id"
        ).to_pandas()
        assert len(out) == 3


class TestDeterministicShuffle:
    def test_permutation_reproducible_salted(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from jochre3_ocr_ray.sources.sampling import deterministic_shuffle

        df = pd.DataFrame({"doc_id": np.arange(500), "v": np.arange(500)})
        ds = rd.from_pandas(df).repartition(8)
        a = deterministic_shuffle(ds, "doc_id").to_pandas()
        b = deterministic_shuffle(
            rd.from_pandas(df).repartition(3), "doc_id"
        ).to_pandas()
        # a permutation (nothing lost), identical across partitionings
        assert sorted(a["doc_id"]) == list(range(500))
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        # actually shuffled, and a salt gives a different epoch order
        assert a["doc_id"].tolist() != list(range(500))
        c = deterministic_shuffle(ds, "doc_id", salt="epoch1").to_pandas()
        assert c["doc_id"].tolist() != a["doc_id"].tolist()
        assert sorted(c["doc_id"]) == list(range(500))

    def test_string_keys(self, ray_session):
        """String key columns hash through the object-array path (a
        numpy '<U' array would crash pandas hash_array)."""
        import pandas as pd
        import ray.data as rd

        from jochre3_ocr_ray.sources.sampling import (
            bottom_k_sample,
            deterministic_shuffle,
        )

        df = pd.DataFrame({"k": [f"doc-{i}" for i in range(300)]})
        ds = rd.from_pandas(df).repartition(4)
        a = deterministic_shuffle(ds, "k").to_pandas()
        assert sorted(a["k"]) == sorted(df["k"])
        assert a["k"].tolist() != sorted(df["k"])
        s = bottom_k_sample(ds, 20, "k").to_pandas()
        assert len(s) == 20 and set(s["k"]) <= set(df["k"])


class TestPairExchangeHelpers:
    def test_popcount64_matches_bit_count(self):
        import numpy as np

        from jochre3_ocr_ray.ops.dedup import _popcount64

        rng = np.random.default_rng(5)
        x = rng.integers(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
        x[:4] = [0, 1, 0xFFFFFFFFFFFFFFFF, 0x8000000000000000]
        got = _popcount64(np.ascontiguousarray(x))
        want = [int(v).bit_count() for v in x.tolist()]
        assert got.tolist() == want
        assert _popcount64(np.empty(0, dtype=np.uint64)).size == 0

    def test_mix_pair_is_pair_function(self):
        """The pair partition key depends only on (a, b) — the same
        pair surfacing from different shingle buckets co-locates."""
        import numpy as np

        from jochre3_ocr_ray.ops.dedup import _mix_pair

        a = np.array([1, 1, 7, 2**40], dtype=np.int64)
        b = np.array([2, 2, 9, 2**41], dtype=np.int64)
        h1 = _mix_pair(a, b)
        h2 = _mix_pair(a.copy(), b.copy())
        assert (h1 == h2).all()
        assert h1[0] == h1[1]          # identical pairs agree
        assert len(set(h1.tolist())) == 3  # distinct pairs spread
