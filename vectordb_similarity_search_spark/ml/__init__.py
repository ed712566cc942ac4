from .embed import EmbeddingModel, federated_train

__all__ = ["EmbeddingModel", "federated_train"]
