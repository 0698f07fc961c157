from .dist import (  # noqa: F401
    initialize_distributed, make_mesh, replicate, shard_batch,
    sharded_loss_and_grad,
)
