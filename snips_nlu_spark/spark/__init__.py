from .stages import (TRIPLE_SCHEMA, parse_transcripts,  # noqa: F401
                     turn_to_triples)
from .graph import dedup_triples, edges_rollup, nodes_rollup  # noqa: F401
from .lineage import build_kg  # noqa: F401
from .session import get_spark  # noqa: F401
