from .assemble import assemble_transactions, match_partial_rollbacks, reassemble_chunks
from .collapse import collapse_net_changes, lineage_from_batch

__all__ = [
    "assemble_transactions",
    "match_partial_rollbacks",
    "reassemble_chunks",
    "collapse_net_changes",
    "lineage_from_batch",
]
