from .topk import knn, similarity_join

__all__ = ["knn", "similarity_join"]
