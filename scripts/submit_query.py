"""spark-submit entrypoint: query a segment index.

    spark-submit --master <cluster> --py-files crwes.zip \
        scripts/submit_query.py --index /path/index \
        --query "hash join" --mode AND --k 10 [--phrase [--slop N]]

Query shapes (one per invocation):
  default            BM25 top-k (--mode AND|OR, --msm N, --field F,
                     --after SCORE:DOC_ID for keyset pagination)
  --phrase           exact phrase; --slop N for ordered proximity
  --prefix/--fuzzy/--regexp   term-expansion postings fetches
  --must/--should/--must-not  ES bool query (overrides --query)
  --mlt DOC_ID --corpus PATH  more_like_this (source text re-analyzed
                              from the corpus parquet; --text-col)
  --filter-where EXPR --corpus PATH   ES bool.filter context: restrict
                              matches by a corpus predicate, scores
                              unchanged
  --rescore PHRASE [--rescore-window N --query-weight W --rescore-weight W]
                              ES rescore: phrase re-rank of the BM25 top
                              window (positional index)
  --boost-col COL --corpus PATH [--boost-modifier M --boost-mode B
                              --boost-factor F]   ES function_score /
                              field_value_factor
  --index A,B,...             sharded/alias search: query N shard
                              indexes with globally merged stats
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default=None,
                    help="segment index path (or A,B,... for sharded "
                         "search); required except for --percolate")
    ap.add_argument("--query", default="")
    ap.add_argument("--mode", default="AND", choices=["AND", "OR"])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--field", default=None)
    ap.add_argument("--msm", type=int, default=None,
                    help="minimum_should_match (OR mode / bool should)")
    ap.add_argument("--after", default=None,
                    help="keyset cursor SCORE:DOC_ID (search_after)")
    ap.add_argument("--phrase", action="store_true")
    ap.add_argument("--slop", type=int, default=0)
    ap.add_argument("--phrase-prefix", dest="phrase_prefix",
                    action="store_true",
                    help="match_phrase_prefix: --query's last term is a "
                         "prefix (autocomplete)")
    ap.add_argument("--max-expansions", dest="max_expansions", type=int,
                    default=50)
    ap.add_argument("--prefix", default=None)
    ap.add_argument("--fuzzy", default=None)
    ap.add_argument("--regexp", default=None)
    ap.add_argument("--must", default=None)
    ap.add_argument("--should", default=None)
    ap.add_argument("--must-not", dest="must_not", default=None)
    ap.add_argument("--suggest", default=None, metavar="PREFIX",
                    help="completion suggester: top-k prefix terms by df")
    ap.add_argument("--explain", type=int, default=None, metavar="DOC_ID",
                    help="per-term BM25 breakdown of one doc for --query")
    ap.add_argument("--collapse-by", dest="collapse_by", default=None,
                    metavar="COL",
                    help="field collapsing: best hit per corpus column "
                         "(needs --corpus)")
    ap.add_argument("--mlt", type=int, default=None, metavar="DOC_ID",
                    help="more_like_this source doc (needs --corpus)")
    ap.add_argument("--corpus", default=None,
                    help="corpus parquet path for --mlt source text")
    ap.add_argument("--text-col", dest="text_col", default="content")
    ap.add_argument("--no-prune", action="store_true")
    ap.add_argument("--filter-where", dest="filter_where", default=None,
                    metavar="EXPR",
                    help="bool.filter context: SQL predicate over --corpus "
                         "restricting matches without changing scores")
    ap.add_argument("--rescore", default=None, metavar="PHRASE",
                    help="rescore the BM25 top window with a match_phrase")
    ap.add_argument("--rescore-window", dest="rescore_window", type=int,
                    default=50)
    ap.add_argument("--query-weight", dest="query_weight", type=float,
                    default=1.0)
    ap.add_argument("--rescore-weight", dest="rescore_weight", type=float,
                    default=1.0)
    ap.add_argument("--boost-col", dest="boost_col", default=None,
                    metavar="COL",
                    help="function_score field_value_factor column "
                         "(needs --corpus)")
    ap.add_argument("--boost-modifier", dest="boost_modifier",
                    default="log1p", choices=["log1p", "sqrt", "none"])
    ap.add_argument("--boost-mode", dest="boost_mode", default="multiply",
                    choices=["multiply", "sum"])
    ap.add_argument("--boost-factor", dest="boost_factor", type=float,
                    default=1.0)
    ap.add_argument("--agg", default=None, metavar="TYPE:FIELD[:PARAM]",
                    help="match-set aggregation over --corpus: "
                         "hist:FIELD:INTERVAL, stats:FIELD, "
                         "card:FIELD[:exact], sig (significant terms "
                         "of --query's match set, uses --text-col)")
    ap.add_argument("--percolate", default=None, metavar="QUERIES_PARQUET",
                    help="reverse search: match --corpus docs against a "
                         "stored-query table (query_id, query[, mode]); "
                         "no index needed")
    ap.add_argument("--count", action="store_true",
                    help="_count API: the match-set size of --query")
    ap.add_argument("--describe", action="store_true",
                    help="print the index health row (_cat/indices "
                         "analog): doc/term/block/posting counts, "
                         "generations, layout")
    ap.add_argument("--join-type", dest="join_type", default=None,
                    choices=["has_child", "has_parent"],
                    help="joining query over --relations: has_child "
                         "returns parents of children matching --query; "
                         "has_parent returns children of matching parents")
    ap.add_argument("--relations", default=None,
                    help="parquet of (doc_id, parent_id) for --join-type")
    ap.add_argument("--score-mode", dest="score_mode", default="max",
                    choices=["max", "sum", "avg", "none"],
                    help="has_child child-score fold (ES score_mode)")
    ap.add_argument("--parent-score", dest="parent_score",
                    action="store_true",
                    help="has_parent: propagate the parent's BM25 to its "
                         "children (default off — ES's and "
                         "SegmentIndex.has_parent's default)")
    ap.add_argument("--constant-score", dest="constant_score", type=float,
                    default=None, metavar="BOOST",
                    help="constant_score: every --query match scores BOOST")
    ap.add_argument("--boost-negative", dest="boost_negative", default=None,
                    metavar="QUERY",
                    help="boosting query: demote docs matching QUERY")
    ap.add_argument("--negative-boost", dest="negative_boost", type=float,
                    default=0.5)
    ap.add_argument("--dis-max", dest="dis_max", default=None,
                    metavar="Q1;Q2;...",
                    help="dis_max over ;-separated subqueries")
    ap.add_argument("--tie-breaker", dest="tie_breaker", type=float,
                    default=0.0)
    ap.add_argument("--synonyms", default=None,
                    metavar="T:A|B;U:C",
                    help="synonym sets, e.g. 'fast:quick|rapid;db:database'"
                         " — each query term expands per Lucene"
                         " SynonymQuery (tf summed, df = max member df)")
    args = ap.parse_args()

    from content_rw_elasticsearch_spark.operators.boolquery import (
        segment_bool_topk,
    )
    from content_rw_elasticsearch_spark.operators.wand import SegmentIndex

    spark = SparkSession.builder.getOrCreate()
    if args.percolate is not None:
        if not args.corpus:
            raise SystemExit("--percolate requires --corpus <parquet path>")
        from content_rw_elasticsearch_spark.operators.percolate import (
            percolate,
        )
        docs = spark.read.parquet(args.corpus)
        qs = spark.read.parquet(args.percolate)
        for row in percolate(docs, qs, text_col=args.text_col).collect():
            print(tuple(row))
        spark.stop()
        return
    if not args.index:
        raise SystemExit("--index is required (except for --percolate)")
    if "," in args.index:
        # sharded/alias search: --index shardA,shardB,... runs the query
        # across all shards with globally merged stats (rank-identical to
        # the union index — operators/wand.search_sharded)
        from content_rw_elasticsearch_spark.operators.wand import (
            search_sharded,
        )
        shards = [SegmentIndex.load(spark, p)
                  for p in args.index.split(",") if p]
        fids = None
        if args.filter_where:
            if not args.corpus:
                raise SystemExit(
                    "--filter-where requires --corpus <parquet path>")
            fids = (spark.read.parquet(args.corpus)
                    .filter(args.filter_where).select("doc_id"))
        df = search_sharded(shards, args.query, k=args.k, mode=args.mode,
                            min_should_match=args.msm, filter_ids=fids)
        for row in df.collect():
            print(tuple(row))
        spark.stop()
        return
    idx = SegmentIndex.load(spark, args.index)
    if args.count:
        df = idx.count(args.query, mode=args.mode, field=args.field,
                       min_should_match=args.msm)
    elif args.describe:
        df = idx.describe()
    elif args.must is not None or args.should is not None \
            or args.must_not is not None:
        df = segment_bool_topk(
            idx, must=args.must or "", should=args.should or "",
            must_not=args.must_not or "", k=args.k,
            min_should_match=args.msm)
    elif args.suggest is not None:
        df = idx.suggest(args.suggest, k=args.k, field=args.field)
    elif args.explain is not None:
        df = idx.explain(args.query, args.explain)
    elif args.collapse_by is not None:
        if not args.corpus:
            raise SystemExit("--collapse-by requires --corpus <parquet path>")
        docs = spark.read.parquet(args.corpus)
        df = idx.collapse(args.query, docs, args.collapse_by, k=args.k,
                          mode=args.mode)
    elif args.mlt is not None:
        if not args.corpus:
            raise SystemExit("--mlt requires --corpus <parquet path>")
        docs = spark.read.parquet(args.corpus)
        df = idx.more_like_this(args.mlt, docs, text_col=args.text_col,
                                k=args.k, prune=not args.no_prune)
    elif args.agg is not None:
        if not args.corpus:
            raise SystemExit("--agg requires --corpus <parquet path>")
        docs = spark.read.parquet(args.corpus)
        parts = args.agg.split(":")
        kind = parts[0]
        fld = parts[1] if len(parts) > 1 else None
        if kind == "sig":
            df = idx.significant_terms(args.query, docs, k=args.k,
                                       mode=args.mode,
                                       text_col=args.text_col)
        elif fld is None:
            raise SystemExit(f"--agg {kind} needs a field: {kind}:FIELD")
        elif kind == "hist":
            df = idx.search_histogram(args.query, docs, fld,
                                      float(parts[2]), mode=args.mode)
        elif kind == "stats":
            df = idx.search_stats(args.query, docs, fld, mode=args.mode)
        elif kind == "card":
            df = idx.search_cardinality(
                args.query, docs, fld, mode=args.mode,
                exact=len(parts) > 2 and parts[2] == "exact")
        else:
            raise SystemExit(f"unknown agg type {kind!r}")
    elif args.join_type is not None:
        if not args.relations:
            raise SystemExit("--join-type requires --relations <parquet>")
        rel = spark.read.parquet(args.relations)
        if args.join_type == "has_child":
            df = idx.has_child(args.query, rel, k=args.k,
                               score_mode=args.score_mode, mode=args.mode)
        else:
            # has_parent scores only on explicit opt-in (--parent-score):
            # --score-mode is a has_child-only knob, and overloading it
            # inverted the ES / has_parent default (ADVICE r5)
            df = idx.has_parent(args.query, rel, k=args.k,
                                score=args.parent_score,
                                mode=args.mode)
    elif args.constant_score is not None:
        df = idx.constant_score(args.query, boost=args.constant_score,
                                k=args.k, mode=args.mode, field=args.field)
    elif args.boost_negative is not None:
        df = idx.boosting(args.query, args.boost_negative,
                          negative_boost=args.negative_boost, k=args.k,
                          mode=args.mode, field=args.field)
    elif args.dis_max is not None:
        df = idx.dis_max([q for q in args.dis_max.split(";") if q],
                         tie_breaker=args.tie_breaker, k=args.k,
                         field=args.field)
    elif args.synonyms is not None:
        syn = {}
        for part in args.synonyms.split(";"):
            if not part:
                continue
            term, _, alts = part.partition(":")
            syn[term.strip()] = [a for a in alts.split("|") if a]
        df = idx.search_synonyms(args.query, syn, k=args.k, mode=args.mode,
                                 field=args.field)
    elif args.rescore is not None:
        df = idx.rescore(args.query, args.rescore, k=args.k,
                         window_size=args.rescore_window,
                         query_weight=args.query_weight,
                         rescore_weight=args.rescore_weight,
                         mode=args.mode, slop=args.slop)
    elif args.boost_col is not None:
        if not args.corpus:
            raise SystemExit("--boost-col requires --corpus <parquet path>")
        docs = spark.read.parquet(args.corpus)
        df = idx.function_score(args.query, docs, args.boost_col, k=args.k,
                                mode=args.mode, factor=args.boost_factor,
                                modifier=args.boost_modifier,
                                boost_mode=args.boost_mode,
                                field=args.field)
    elif args.phrase_prefix:
        df = idx.phrase_prefix_search(args.query, field=args.field,
                                      max_expansions=args.max_expansions)
    elif args.phrase:
        df = idx.phrase_search(args.query, field=args.field, slop=args.slop)
    elif args.prefix is not None:
        df = idx.prefix_postings(args.prefix, field=args.field)
    elif args.fuzzy is not None:
        df = idx.fuzzy_postings(args.fuzzy, field=args.field)
    elif args.regexp is not None:
        df = idx.regexp_postings(args.regexp, field=args.field)
    else:
        after = None
        if args.after:
            score, doc = args.after.split(":")
            after = (float(score), int(doc))
        fids = None
        if args.filter_where:
            if not args.corpus:
                raise SystemExit(
                    "--filter-where requires --corpus <parquet path>")
            fids = (spark.read.parquet(args.corpus)
                    .filter(args.filter_where).select("doc_id"))
        df = idx.search(args.query, k=args.k, mode=args.mode,
                        prune=not args.no_prune, field=args.field,
                        min_should_match=args.msm, after=after,
                        filter_ids=fids)
    for row in df.collect():
        print(tuple(row))
    spark.stop()


if __name__ == "__main__":
    main()
