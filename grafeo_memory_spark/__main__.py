"""Module entry point: ``python -m grafeo_memory_spark`` runs the CLI
(parity with the reference's ``python -m`` entry,
``src/grafeo_memory/__main__.py``)."""

import sys

from grafeo_memory_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
