from .search import brute_topk, ivf_assign, ivf_compile, ivf_topk, query_vector

__all__ = ["brute_topk", "ivf_assign", "ivf_compile", "ivf_topk", "query_vector"]
