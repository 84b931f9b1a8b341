"""CLI — the engine's equivalent of the reference's canonical entry point
`/root/reference/fusion_pipeline.py:30-109` (dataset path + attribute types
+ preprocessing config + model → fused data + metrics), plus the transcript
flagship pipeline.

Examples:

  # reference-style static TSV corpus (conflicting_data/ + ground_truth/)
  python -m trustfuse_ray static \\
      --data DIR/conflicting_data --gt DIR/ground_truth \\
      --headers Source,ISBN,Title,Authors --entity-col ISBN \\
      --attribute-types types.json [--preprocess config.json] \\
      --model CRH --out /tmp/out

  # transcript corpus (Parquet turns) end-to-end, resumable
  python -m trustfuse_ray transcripts --data DATA_DIR --model CRH \\
      --out /tmp/out [--resume]

This module owns its Ray session (guarded init) — the library itself never
calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True)


def _print_metrics(m: dict) -> None:
    print(json.dumps({
        "ov_p": m["ov_p"], "ov_r": m["ov_r"], "ov_acc": m["ov_acc"],
        "ov_f1_score": m["ov_f1_score"], "c_rate": m["c_rate"],
        "ov_p_median": m["ov_p_median"], "ov_r_median": m["ov_r_median"],
    }, indent=1))


def cmd_static(args) -> int:
    _ensure_ray()
    from trustfuse_ray import evaluation
    from trustfuse_ray.fuse import make_model, run_fusion
    from trustfuse_ray.sources.static import melt_to_claims, read_static_tsv
    from trustfuse_ray.stages.preprocess import apply_preprocessing

    headers = args.headers.split(",")
    with open(args.attribute_types) as fh:
        attr_types = json.load(fh)
    attrs = [h for h in headers if h not in (args.source_col,
                                             args.entity_col)]

    wide = read_static_tsv(args.data, headers, sep=args.sep)
    claims = melt_to_claims(wide, entity_col=args.entity_col, attrs=attrs,
                            attribute_types=attr_types,
                            source_col=args.source_col)
    if args.preprocess:
        with open(args.preprocess) as fh:
            config = json.load(fh)
        claims = apply_preprocessing(claims, config, attr_types=attr_types)
    claims = claims.materialize()

    triples, weights = run_fusion(claims, make_model(args.model))
    if args.out:
        triples.write_parquet(args.out + "/triples")
        with open(args.out + "/source_weights.json", "w") as fh:
            json.dump({str(b): w for b, w in weights.items()}, fh, indent=1)

    if args.gt:
        gt_headers = [h for h in headers if h != args.source_col]
        gt_wide = read_static_tsv(args.gt, gt_headers, sep=args.sep)
        gt = melt_to_claims(gt_wide, entity_col=args.entity_col,
                            attrs=attrs, attribute_types=attr_types,
                            source_col=args.entity_col)
        m = evaluation.get_metrics(
            triples, gt, claims,
            gt_cols={"bucket_id": "bucket_id", "attr": "attr",
                     "entity": "entity", "value": "value_str"})
        _print_metrics(m)
    else:
        print(json.dumps({"triples": triples.count(),
                          "sources": sum(len(w) for w in weights.values())}))
    return 0


def cmd_transcripts(args) -> int:
    _ensure_ray()
    from trustfuse_ray.pipelines.kg import (run_kg_pipeline_resumable)

    summary = run_kg_pipeline_resumable(args.data, args.out,
                                        model=args.model,
                                        resolve=args.resolve)
    print(json.dumps({k: (len(v) if isinstance(v, list) else v)
                      for k, v in summary.items()}))
    return 0 if summary.get("status") == "complete" else 1


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="trustfuse_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    st = sub.add_parser("static", help="reference-style TSV corpus fusion")
    st.add_argument("--data", required=True)
    st.add_argument("--gt")
    st.add_argument("--headers", required=True,
                    help="comma-separated column names incl. Source")
    st.add_argument("--entity-col", required=True)
    st.add_argument("--source-col", default="Source")
    st.add_argument("--attribute-types", required=True,
                    help="JSON {attr: string|quantity|entity|time}")
    st.add_argument("--preprocess", help="JSON preprocessing config")
    st.add_argument("--model", default="CRH")
    st.add_argument("--sep", default="\t")
    st.add_argument("--out")
    st.set_defaults(fn=cmd_static)

    tr = sub.add_parser("transcripts", help="flagship transcript pipeline")
    tr.add_argument("--data", required=True,
                    help="dir with transcripts/ aliases.parquet "
                         "attr_types.json")
    tr.add_argument("--model", default="CRH")
    tr.add_argument("--out", required=True)
    tr.add_argument("--resolve", action="store_true",
                    help="fuzzy entity resolution before fusion")
    tr.set_defaults(fn=cmd_transcripts)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
