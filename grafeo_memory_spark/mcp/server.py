"""MCP server plumbing: registry, app context, optional FastMCP adapter.

Reference shape: `/root/reference/src/grafeo_memory/mcp/server.py:50-95`
— a FastMCP instance whose lifespan yields an ``AppContext(manager=...)``
that every tool reaches through
``ctx.request_context.lifespan_context.manager``. We keep that exact
context path so tests (and any MCP host) see the same contract, but the
registry itself is dependency-free: the ``mcp`` package is only needed
for a real stdio/sse transport, never for the tool logic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class AppContext:
    """Lifespan state handed to every tool (reference `server.py:17-19`)."""

    manager: Any


@dataclass
class _RequestContext:
    lifespan_context: AppContext


@dataclass
class Context:
    """Minimal stand-in for ``mcp.server.fastmcp.Context`` carrying the
    one attribute path the tools use."""

    request_context: _RequestContext


def make_context(manager: Any) -> Context:
    """Wrap an engine (or fake) in the MCP context shape tools expect."""
    return Context(request_context=_RequestContext(lifespan_context=AppContext(manager=manager)))


@dataclass
class ToolRegistry:
    """FastMCP-shaped decorator registry (`@mcp.tool()`,
    `@mcp.resource(uri)`, `@mcp.prompt()`) that just records callables.

    Keeps the module-level registration idiom of the reference
    (`tools.py:27`, `resources.py:13`, `prompts.py:8`) importable in
    environments without the ``mcp`` package.
    """

    name: str = "grafeo-memory-spark"
    tools: dict[str, Callable] = field(default_factory=dict)
    resources: dict[str, Callable] = field(default_factory=dict)
    prompts: dict[str, Callable] = field(default_factory=dict)

    def tool(self) -> Callable[[Callable], Callable]:
        def deco(fn: Callable) -> Callable:
            self.tools[fn.__name__] = fn
            return fn

        return deco

    def resource(self, uri: str) -> Callable[[Callable], Callable]:
        def deco(fn: Callable) -> Callable:
            self.resources[uri] = fn
            return fn

        return deco

    def prompt(self) -> Callable[[Callable], Callable]:
        def deco(fn: Callable) -> Callable:
            self.prompts[fn.__name__] = fn
            return fn

        return deco


#: module-level registry the tool/resource/prompt modules decorate onto,
#: mirroring the reference's module-level ``mcp = FastMCP(...)``
mcp = ToolRegistry()


def build_fastmcp(engine: Any, *, name: str = "grafeo-memory-spark"):
    """Adapt the registry onto a real FastMCP server (requires the
    ``mcp`` package; reference `server.py:65-91`).

    Every registered tool is re-exposed with the engine pre-bound, so
    the FastMCP transport layer never needs our Context shim.
    """
    try:
        from mcp.server.fastmcp import FastMCP
    except ImportError as exc:  # pragma: no cover - package not in container
        raise ImportError(
            "the 'mcp' package is required for a real MCP transport; "
            "the in-process ToolRegistry surface works without it"
        ) from exc

    import functools

    server = FastMCP(name)
    ctx = make_context(engine)
    for fn in mcp.tools.values():
        bound = functools.partial(fn, ctx=ctx)
        functools.update_wrapper(bound, fn)
        server.tool()(bound)
    for uri, fn in mcp.resources.items():
        bound = functools.partial(fn, ctx=ctx)
        functools.update_wrapper(bound, fn)
        server.resource(uri)(bound)
    for fn in mcp.prompts.values():
        server.prompt()(fn)
    return server


def main() -> None:  # pragma: no cover - needs mcp + a live engine
    """stdio entry point (reference `server.py:83-91`)."""
    import sys

    from grafeo_memory_spark.manager import MemoryEngine
    from grafeo_memory_spark.session import get_spark

    spark = get_spark(app_name="grafeo-memory-spark-mcp")
    engine = MemoryEngine(spark)
    server = build_fastmcp(engine)
    transport = sys.argv[1] if len(sys.argv) > 1 else "stdio"
    server.run(transport=transport)


if __name__ == "__main__":  # pragma: no cover
    main()
