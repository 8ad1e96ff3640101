"""Worker process for the 2-process jax.distributed DP test.

Run as: python tests/_multihost_worker.py <process_id> <port> <out_file>

Each of the 2 processes exposes 4 virtual CPU devices; together they form
an 8-device global mesh whose 'dp' axis SPANS THE PROCESS BOUNDARY — the
CPU stand-in for a multi-host TPU slice where dp rides DCN (SURVEY.md §2.6
item 4). The worker runs the UNMODIFIED shard_map train step
(fpsg_tpu.parallel.shard_step) over the global mesh: only mesh construction
and array placement differ from the single-process path, which is exactly
the claim under test. Cross-process collectives lower to gloo (the CPU
analog of the ICI/DCN all-reduce XLA emits on TPU).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_file = sys.argv[3]

# Bootstrap BEFORE importing jax anywhere (conftest recipe; the axon TPU
# plugin ignores the env var, so also force via jax.config below).
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from fpsg_tpu.data import DeviceCorpus, synthetic_corpus  # noqa: E402
from fpsg_tpu.models import ImgPCProtoNet  # noqa: E402
from fpsg_tpu.parallel.shard_step import make_shard_map_train_step  # noqa: E402
from fpsg_tpu.train import (  # noqa: E402
    TrainState, init_model, make_optimizer,
)


def replicate_global(tree, mesh):
    """Host pytree -> fully-replicated GLOBAL arrays (multi-process safe).

    jax.device_put would target only addressable devices; callback-built
    arrays carry the global sharding both processes agree on.
    """
    sharding = NamedSharding(mesh, P())

    def one(x):
        a = np.asarray(x)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    return jax.tree.map(one, tree)


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    # devices[] is ordered by process id: axis 0 of the (8,1) reshape spans
    # the process boundary for the first/last 4 entries.
    mesh = Mesh(np.array(jax.devices()).reshape(8, 1), ("dp", "mp"))

    model = ImgPCProtoNet(
        img_backbone="tiny", num_clusters=2, num_nodes=2,
        num_points=64, bottleneck_size=1536,
    )
    corpus_host = DeviceCorpus.build(
        synthetic_corpus(n_classes=2, items_per_class=8, n_pts=64,
                         img_size=16)
    )
    sample = {
        "xs": jnp.zeros((3, 16, 16, 3)), "xq": jnp.zeros((1, 16, 16, 3)),
        "xad": jnp.zeros((3, 16, 16, 3)), "pcs": jnp.zeros((3, 64, 3)),
        "pcq": jnp.zeros((1, 64, 3)), "pcad": jnp.zeros((3, 64, 3)),
    }
    variables = init_model(model, sample)  # deterministic: same on both procs
    tx = make_optimizer(lr=1e-3, steps_per_epoch=4, sgd=True)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    state = replicate_global(state, mesh)
    corpus = replicate_global(corpus_host, mesh)

    step = make_shard_map_train_step(model, tx, n_support=3, n_query=1,
                                     mesh=mesh)
    losses = []
    for i in range(3):
        state, metrics = step(state, corpus, jax.random.PRNGKey(i))
        local = np.concatenate([
            np.asarray(s.data)
            for s in metrics["query_rec_loss"].addressable_shards
        ])
        assert local.shape == (4,), local.shape
        assert np.isfinite(local).all(), local
        losses.append(float(local.mean()))

    # Every locally-addressable shard of the (replicated) params must be
    # bitwise identical — the psum'd update reached all devices.
    leaves = jax.tree.leaves(state.params)
    for leaf in leaves:
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    checksum = float(
        sum(np.float64(np.abs(np.asarray(l.addressable_shards[0].data))
                       .sum()) for l in leaves)
    )
    with open(out_file, "w") as f:
        f.write(f"{checksum:.10e} {losses[0]:.10e} {losses[-1]:.10e}\n")
    print(f"pid={pid} ok checksum={checksum:.6e} losses={losses}",
          flush=True)


if __name__ == "__main__":
    main()
