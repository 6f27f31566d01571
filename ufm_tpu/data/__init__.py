from ufm_tpu.data.pairs import FlowPairDataset, train_batches

__all__ = ["FlowPairDataset", "train_batches"]
