"""MCP (Model Context Protocol) surface over the Spark memory engine.

Mirrors the reference's MCP integration path
(`/root/reference/src/grafeo_memory/mcp/` — `server.py`, `tools.py`,
`resources.py`, `prompts.py`): the same tool names, argument shapes, and
JSON response envelopes, re-expressed over the PySpark engine facade.

The ``mcp`` python package is optional: tools/resources/prompts register
on an in-process :class:`~grafeo_memory_spark.mcp.server.ToolRegistry`
that is shaped like FastMCP's decorator API, and
:func:`~grafeo_memory_spark.mcp.server.build_fastmcp` adapts the same
registrations onto a real FastMCP server when the package is installed.
"""

from grafeo_memory_spark.mcp.server import (  # noqa: F401
    AppContext,
    ToolRegistry,
    build_fastmcp,
    make_context,
    mcp,
)
from grafeo_memory_spark.mcp import prompts, resources, tools  # noqa: E402,F401
