"""CLI entry point — the JochreAppBase / JochreCLI analog.

Usage (each subcommand owns its own Ray session; submit with
``ray job submit -- python -m jochre3_ocr_ray <cmd> ...`` on a real
cluster, or run directly single-node):

    python -m jochre3_ocr_ray extract  INPUT_DIR WORK_DIR [--shards N]
    python -m jochre3_ocr_ray assemble WORK_DIR            # after extract
    python -m jochre3_ocr_ray pipeline INPUT_DIR WORK_DIR  # both stages
    python -m jochre3_ocr_ray generate N_TURNS OUT_DIR     # synth corpus

Reference: ``core/JochreCLI.scala:6-50`` (arg parsing) +
``core/JochreAppBase.scala:17-121`` (dispatch).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from .config import configure_context

    configure_context()
    return ray


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="jochre3_ocr_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract")
    p.add_argument("input_dir")
    p.add_argument("work_dir")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--no-blocks", action="store_true")

    p = sub.add_parser("assemble")
    p.add_argument("work_dir")
    p.add_argument("--strategy", default="bucketed",
                   choices=["bucketed", "salted", "sorted"])

    p = sub.add_parser("pipeline")
    p.add_argument("input_dir")
    p.add_argument("work_dir")
    p.add_argument("--shards", type=int, default=8)

    p = sub.add_parser("generate")
    p.add_argument("n_turns", type=int)
    p.add_argument("out_dir")
    p.add_argument("--seed", type=int, default=42)

    p = sub.add_parser("stats")
    p.add_argument("work_dir")

    # single-payload serving entry — the REST AnalysisApp analog
    # (api/analysis/AnalysisApp.scala:25-130: POST one file, get the
    # analyzed output formats back) without dragging in a web
    # framework: one payload in (file or stdin), the three output
    # formats out as JSON.
    p = sub.add_parser("serve")
    p.add_argument("payload", nargs="?", default="-",
                   help="payload file, or '-' for stdin")
    p.add_argument("--format", dest="fmt", default="all",
                   choices=["text", "processed", "alto", "all"])
    p.add_argument("--out-zip", default=None,
                   help="also write the output formats into a zip — "
                        "the API's zipped OutputLocation sink analog")
    p.add_argument("--words", default=None,
                   help="lexicon-lookup mode (GET /word-in-lexicon): "
                        "comma-separated words -> frequency classes "
                        "(>0 known, 0 unknown, <0 impossible)")
    p.add_argument("--standardize", default=None,
                   help="standardize mode (GET /standardize): "
                        "comma-separated words -> standardized forms")
    p.add_argument("--detransliterate", default=None,
                   help="reverse transliteration (YivoTransliterator."
                        "detransliterate analog): comma-separated Roman "
                        "words -> script forms")
    p.add_argument("--dehyphenate", action="store_true",
                   help="dehyphenate mode (POST /dehyphenate): treat "
                        "the payload as a text file, print the "
                        "dehyphenated text")

    p = sub.add_parser("prep")
    p.add_argument("input_dir")
    p.add_argument("out_dir")
    p.add_argument("--kind", default="lines", choices=["lines", "words"])
    p.add_argument("--val-every", type=int, default=10)

    p = sub.add_parser("ingest")
    p.add_argument("input_dir", help="documents-shaped parquet dir")
    p.add_argument("index_dir", help="persistent hash-index dir")
    p.add_argument("out_dir", help="where surviving rows are written")
    p.add_argument("--run-id", required=True)
    p.add_argument("--near", action="store_true",
                   help="near-dup (MinHash band index) instead of exact")
    p.add_argument("--buckets", type=int, default=None,
                   help="index bucket count (fixed at creation; size so "
                        "corpus_rows/buckets fits worker memory)")

    p = sub.add_parser("evaluate")
    p.add_argument("predicted_dir")
    p.add_argument("expected_dir")
    p.add_argument("--out", default=None)
    p.add_argument("--predicted-col", default="processed_text")
    p.add_argument("--expected-col", default="expected_text")

    args = parser.parse_args(argv)

    if args.cmd == "generate":
        from .sources.corpus import generate_transcripts

        out = generate_transcripts(args.n_turns, args.out_dir, seed=args.seed)
        print(json.dumps({"out_dir": str(out), "n_turns": args.n_turns}))
        return 0

    if args.cmd == "stats":
        # lineage summary: no Ray session needed (reads manifests only)
        from .state.lineage import LineageLog

        log = LineageLog(f"{args.work_dir}/turns")
        shards = log.completed_shards()
        manifests = [
            json.loads(log._manifest_path(s).read_text()) for s in shards
        ]
        print(
            json.dumps(
                {
                    "completed_shards": len(shards),
                    "rows": sum(m["rows_out"] for m in manifests),
                    "n_words": sum(
                        m.get("metrics", {}).get("n_words", 0) for m in manifests
                    ),
                    "empty_turns": sum(
                        m.get("metrics", {}).get("empty_turns", 0)
                        for m in manifests
                    ),
                    "total_wall_sec": round(
                        sum(m["wall_sec"] for m in manifests), 1
                    ),
                    "pipeline_version": manifests[0]["pipeline_version"]
                    if manifests
                    else None,
                }
            )
        )
        return 0

    if args.cmd == "serve":
        # pure-kernel path: one request, no Ray session (the same
        # extract_turn the distributed stage applies per batch).
        # The --words / --standardize / --dehyphenate modes mirror the
        # reference API's non-analysis endpoints
        # (api/analysis/AnalysisApp.scala:158-246).
        if args.words is not None:
            from .functions.lexicon import Lexicon

            lex = Lexicon.load()
            words = [w for w in args.words.split(",") if w]
            print(
                json.dumps(
                    {
                        "frequencies": [
                            {"word": w, "frequency": lex.get_frequency(w)}
                            for w in words
                        ]
                    },
                    ensure_ascii=False,
                )
            )
            return 0
        if args.standardize is not None:
            from .functions.transliterate import Transliterator

            tr = Transliterator()
            words = [w for w in args.standardize.split(",") if w]
            print(
                json.dumps(
                    {"standardized": [tr.transliterate(w) for w in words]},
                    ensure_ascii=False,
                )
            )
            return 0
        if args.detransliterate is not None:
            from .functions.transliterate import Transliterator

            tr = Transliterator()
            words = [w for w in args.detransliterate.split(",") if w]
            print(
                json.dumps(
                    {"script": [tr.detransliterate(w) for w in words]},
                    ensure_ascii=False,
                )
            )
            return 0
        payload = (
            sys.stdin.read()
            if args.payload == "-"
            else open(args.payload, encoding="utf-8").read()
        )
        if args.dehyphenate:
            from .functions.extract import dehyphenate_text
            from .functions.lexicon import Lexicon

            # text/plain response parity: raw text, not JSON
            sys.stdout.write(dehyphenate_text(payload, Lexicon.load()))
            return 0
        from .functions.extract import extract_turn
        from .functions.lexicon import Lexicon
        from .functions.render_alto import render_alto

        result = extract_turn(payload, 0, Lexicon.load())
        out = {"confidence": round(result["confidence"], 6)}
        if args.fmt in ("text", "all"):
            out["text"] = result["extracted_text"]
        if args.fmt in ("processed", "all"):
            out["processed_text"] = result["processed_text"]
        if args.fmt in ("alto", "all"):
            out["alto_xml"] = render_alto(
                "payload_0", result["blocks"], result["confidence"]
            )
        if args.out_zip:
            # the reference API's response is a ZIP of the requested
            # output files (api/analysis zipped OutputLocation)
            import zipfile

            with zipfile.ZipFile(args.out_zip, "w") as zf:
                if "text" in out:
                    zf.writestr("payload_0.txt", out["text"])
                if "processed_text" in out:
                    zf.writestr("payload_0_processed.txt", out["processed_text"])
                if "alto_xml" in out:
                    zf.writestr("payload_0_alto4.xml", out["alto_xml"])
            out["zip"] = args.out_zip
        print(json.dumps(out))
        return 0

    ray = _ray_session()
    try:
        from .pipelines.extract import run_assembly, run_extraction, run_pipeline

        if args.cmd == "extract":
            metrics = run_extraction(
                args.input_dir,
                f"{args.work_dir}/turns",
                num_shards=args.shards,
                resume=not args.no_resume,
                include_blocks=not args.no_blocks,
            )
        elif args.cmd == "evaluate":
            from .ops.evaluation import run_evaluation

            table = run_evaluation(
                args.predicted_dir,
                args.expected_dir,
                out_path=args.out,
                predicted_col=args.predicted_col,
                expected_col=args.expected_col,
            )
            mean = table.to_pandas()
            mean = mean[mean["key"] == "__mean__"].iloc[0]
            metrics = {
                "rows": len(table) - 1,
                "mean_cer": float(mean["cer"]),
                "mean_bow_cosine": float(mean["bow_cosine"]),
            }
        elif args.cmd == "ingest":
            import pyarrow.parquet as _pq

            from .sources.reader import read_transcripts
            from .state.hash_index import dedup_incremental
            from .state.minhash_index import near_dedup_incremental

            new_ds = read_transcripts(
                args.input_dir, columns=["doc_id", "text"]
            )
            bkw = {"buckets": args.buckets} if args.buckets else {}
            if args.near:
                res = near_dedup_incremental(
                    new_ds, args.index_dir, args.run_id,
                    out_dir=args.out_dir, **bkw,
                )
            else:
                # exact path streams survivors to disk WORKER-side
                res = dedup_incremental(
                    new_ds, args.index_dir, args.run_id,
                    out_dir=args.out_dir, **bkw,
                )
            if res["already_ingested"]:
                metrics = {"run_id": args.run_id, "already_ingested": True}
            elif res.get("survivors") is not None:
                from pathlib import Path as _Path

                out = _Path(args.out_dir)
                out.mkdir(parents=True, exist_ok=True)
                _pq.write_table(
                    res["survivors"], out / f"run_{args.run_id}.parquet"
                )
                metrics = {
                    "run_id": args.run_id,
                    "new_rows": res["new_rows"],
                    "kept_rows": res["kept_rows"],
                    "out": str(out / f"run_{args.run_id}.parquet"),
                }
            else:
                metrics = {
                    "run_id": args.run_id,
                    "new_rows": res["new_rows"],
                    "kept_rows": res["kept_rows"],
                    "out": res["out_dir"],
                }
        elif args.cmd == "prep":
            from .pipelines.corpus_prep import prepare_training_corpus

            metrics = prepare_training_corpus(
                args.input_dir,
                args.out_dir,
                kind=args.kind,
                validation_one_every=args.val_every,
            )
        elif args.cmd == "assemble":
            metrics = run_assembly(
                f"{args.work_dir}/turns",
                f"{args.work_dir}/conversations",
                strategy=args.strategy,
            )
        else:
            metrics = run_pipeline(
                args.input_dir, args.work_dir, num_shards=args.shards
            )
        print(json.dumps(metrics))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
