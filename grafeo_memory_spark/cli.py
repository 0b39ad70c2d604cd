"""Command-line interface over :class:`MemoryEngine` — the engine-side
analog of the reference CLI (`/root/reference/src/grafeo_memory/cli.py`,
same subcommand surface: add / search / list / update / delete /
history / summarize / stats / explain).

Each invocation opens the store directory (``--store``, or
``$GRAFEO_SPARK_STORE``), runs one command, and — for mutating commands
— writes the store back. Spark-first: every command body is a thin call
into the engine's DataFrame plans; the CLI only formats rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Any


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="grafeo-spark",
        description="Memory engine on PySpark — store, search, and "
        "maintain agent memories",
    )
    parser.add_argument(
        "--store",
        "-d",
        default=None,
        help="store directory (default $GRAFEO_SPARK_STORE; in-memory "
        "empty store if unset)",
    )
    parser.add_argument("--user", "-u", default="default", help="user id scope")
    parser.add_argument(
        "--model",
        "-m",
        default=None,
        help="model string for LLM-protocol factories (default "
        "$GRAFEO_SPARK_MODEL; the built-in deterministic protocols "
        "ignore it — inject real extractor/reconciler objects to use it)",
    )
    parser.add_argument(
        "--json", action="store_true", help="machine-readable JSON output"
    )
    parser.add_argument(
        "--version", action="store_true", help="show version and exit"
    )
    parser.add_argument(
        "--yolo", action="store_true",
        help="enable all features (graph metrics, episodes, tracing, "
        "usage logging)",
    )
    sub = parser.add_subparsers(dest="command")

    p_add = sub.add_parser("add", help="Add a memory from text")
    p_add.add_argument("text", help="text to add ('-' reads stdin)")
    p_add.add_argument("--session", default=None, help="session id")
    p_add.add_argument(
        "--type", default=None, dest="memory_type",
        choices=("semantic", "episodic", "procedural"),
    )
    p_add.add_argument(
        "--no-infer", action="store_true",
        help="store raw text without extraction/reconciliation",
    )

    p_search = sub.add_parser("search", help="Search memories")
    p_search.add_argument("query")
    p_search.add_argument("-k", type=int, default=10)
    p_search.add_argument("--include-expired", action="store_true")
    p_search.add_argument(
        "--type", default=None, dest="memory_type",
        choices=("semantic", "episodic", "procedural"),
    )
    p_search.add_argument(
        "--min-score", type=float, default=None,
        help="minimum score threshold (0.0-1.0)",
    )

    p_list = sub.add_parser("list", help="List all memories")
    p_list.add_argument("--limit", type=int, default=None)
    p_list.add_argument("--include-expired", action="store_true")
    p_list.add_argument(
        "--type", default=None, dest="memory_type",
        choices=("semantic", "episodic", "procedural"),
    )

    p_update = sub.add_parser("update", help="Update a memory's text")
    p_update.add_argument("memory_id", type=int)
    p_update.add_argument("text")

    p_delete = sub.add_parser("delete", help="Delete memories")
    p_delete.add_argument("memory_id", type=int, nargs="?", default=None)
    p_delete.add_argument(
        "--all", action="store_true", help="delete every memory for --user"
    )
    p_delete.add_argument(
        "--hard", action="store_true", help="physical delete (default soft)"
    )
    p_delete.add_argument(
        "--yes", "-y", action="store_true",
        help="skip the interactive confirmation prompt",
    )

    p_history = sub.add_parser(
        "history", help="Show change history for a memory"
    )
    p_history.add_argument("memory_id", type=int)

    p_summarize = sub.add_parser("summarize", help="Consolidate old memories")
    p_summarize.add_argument("--preserve-recent", type=int, default=5)
    p_summarize.add_argument("--batch-size", type=int, default=20)

    sub.add_parser("stats", help="Show memory system statistics")

    p_explain = sub.add_parser(
        "explain", help="Explain a search query step-by-step"
    )
    p_explain.add_argument("query")
    p_explain.add_argument("-k", type=int, default=10)
    p_explain.add_argument(
        "--type", default=None, dest="memory_type",
        choices=("semantic", "episodic", "procedural"),
    )
    return parser


def _print(data: Any, *, json_mode: bool, out) -> None:
    if json_mode:
        print(json.dumps(data, default=str), file=out)
    elif isinstance(data, list):
        for item in data:
            print(item, file=out)
    else:
        print(data, file=out)


def _rows(df, cols: list[str]) -> list[dict[str, Any]]:
    return [{c: r[c] for c in cols} for r in df.select(*cols).collect()]


def main(argv: list[str] | None = None, *, engine=None, out=None) -> int:
    """Run one CLI command. ``engine``/``out`` are injectable for tests
    (the reference tests its CLI the same way, driving ``main`` with an
    in-memory manager)."""
    out = out or sys.stdout
    args = _build_parser().parse_args(argv)
    if getattr(args, "version", False):
        from grafeo_memory_spark import __version__

        print(__version__, file=out)
        return 0
    if args.command is None:
        _build_parser().print_help(file=out)
        return 2

    store_path = args.store or os.environ.get("GRAFEO_SPARK_STORE")
    own_engine = engine is None
    if own_engine:
        from grafeo_memory_spark.manager import MemoryEngine
        from grafeo_memory_spark.session import get_spark

        spark = get_spark(app_name="grafeo-spark-cli")
        if store_path and os.path.exists(store_path):
            if args.yolo:
                from grafeo_memory_spark.store import load_store

                engine = MemoryEngine.yolo(
                    spark, store=load_store(spark, store_path)
                )
            else:
                engine = MemoryEngine.open(spark, store_path)
        elif args.yolo:
            engine = MemoryEngine.yolo(spark)
        else:
            engine = MemoryEngine(spark)

    mutated = False
    if args.command == "add":
        text = sys.stdin.read() if args.text == "-" else args.text
        res = engine.add(
            text, user_id=args.user, session_id=args.session,
            memory_type=args.memory_type, infer=not args.no_infer,
        )
        _print(
            {"added": res.added_ids, "updated": res.updated_ids,
             "expired": res.expired_ids},
            json_mode=args.json, out=out,
        )
        mutated = True
    elif args.command == "search":
        kw = {}
        if args.memory_type is not None:
            kw["memory_type"] = args.memory_type
        if args.min_score is not None:
            kw["min_score"] = args.min_score
        df = engine.search(
            args.query, user_id=args.user, k=args.k,
            include_expired=args.include_expired, **kw,
        )
        _print(
            _rows(df, ["memory_id", "text", "score"]),
            json_mode=args.json, out=out,
        )
    elif args.command == "list":
        df = engine.get_all(
            user_id=args.user, include_expired=args.include_expired,
            limit=args.limit,
            filters=(
                {"memory_type": args.memory_type}
                if args.memory_type is not None else None
            ),
        )
        _print(
            _rows(df, ["id", "text", "memory_type", "created_at"]),
            json_mode=args.json, out=out,
        )
    elif args.command == "update":
        res = engine.update(args.memory_id, args.text, user_id=args.user)
        _print(
            {"updated": res.updated_ids or res.added_ids},
            json_mode=args.json, out=out,
        )
        mutated = True
    elif args.command == "delete":
        # interactive confirmation (reference cli.py --yes): prompt only
        # on a TTY so scripted/test invocations stay non-blocking
        if not args.yes and sys.stdin.isatty():  # pragma: no cover
            target = "ALL memories" if args.all else f"memory {args.memory_id}"
            if input(f"delete {target} for {args.user}? [y/N] ").lower() != "y":
                print("aborted", file=out)
                return 1
        if args.all:
            n = engine.delete_all(user_id=args.user)
            _print({"deleted_count": n}, json_mode=args.json, out=out)
        elif args.memory_id is None:
            print("delete: need a memory_id or --all", file=out)
            return 2
        else:
            engine.delete(args.memory_id, hard=args.hard)
            _print({"deleted": [args.memory_id]}, json_mode=args.json, out=out)
        mutated = True
    elif args.command == "history":
        _print(
            _rows(
                engine.history(args.memory_id),
                ["event", "old_text", "new_text", "timestamp"],
            ),
            json_mode=args.json, out=out,
        )
    elif args.command == "summarize":
        sids = engine.summarize(
            user_id=args.user, preserve_recent=args.preserve_recent,
            batch_size=args.batch_size,
        )
        _print({"summary_ids": sids}, json_mode=args.json, out=out)
        mutated = True
    elif args.command == "stats":
        _print(engine.stats(), json_mode=args.json, out=out)
    elif args.command == "explain":
        kw = (
            {"memory_type": args.memory_type}
            if args.memory_type is not None else {}
        )
        engine.search(args.query, user_id=args.user, k=args.k, **kw).collect()
        _print(
            {"stages": engine.explain()} if args.json else engine.explain(),
            json_mode=args.json, out=out,
        )

    if mutated and own_engine and store_path:
        from grafeo_memory_spark.store import save_store

        save_store(engine.store, store_path)
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
