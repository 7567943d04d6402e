from .join import broadcast_join, hash_join
from .queries import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL", "broadcast_join", "hash_join"]
