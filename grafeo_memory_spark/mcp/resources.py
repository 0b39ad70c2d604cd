"""MCP resources (reference `mcp/resources.py`: memory://config,
memory://stats)."""

from __future__ import annotations

import json
from dataclasses import asdict, is_dataclass
from typing import Any

from grafeo_memory_spark.mcp.server import mcp


@mcp.resource("memory://config")
def memory_config(ctx: Any = None) -> str:
    """Current engine configuration: embedder dims, scoring knobs,
    enabled policies (reference `resources.py:13-30`)."""
    manager = ctx.request_context.lifespan_context.manager
    cfg = getattr(manager, "config", None)
    return json.dumps(
        {
            "engine": "grafeo-memory-spark",
            "embedder_dimensions": getattr(
                getattr(manager, "embedder", None), "dimensions", None
            ),
            "score_config": asdict(cfg) if is_dataclass(cfg) else cfg,
            "enable_vision": getattr(manager, "describer", None) is not None,
            "enable_rerank": getattr(manager, "reranker", None) is not None,
            "enable_graph_algorithms": getattr(
                manager, "enable_graph_algorithms", False
            ),
            "instrument": getattr(manager, "tracer", None) is not None,
        },
        default=str,
    )


@mcp.resource("memory://stats")
def memory_stats_resource(ctx: Any = None) -> str:
    """Memory system statistics (reference `resources.py:33-48`)."""
    manager = ctx.request_context.lifespan_context.manager
    return json.dumps(dict(manager.stats()), default=str)
