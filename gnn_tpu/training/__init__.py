from gnn_tpu.training.losses import get_loss, LOSSES
from gnn_tpu.training.optimizers import make_optimizer, optimizer_config

__all__ = ["get_loss", "LOSSES", "make_optimizer", "optimizer_config"]
