"""The core network: image branch + prototype branch + primitive decoder.

Re-design of ``ImgPCProtoNet`` (reference ``src/models/few_shot.py:19-214``)
as a flax module with pure ``loss`` / ``reconstruct`` / ``generate``
entry points. One call = one fused XLA computation: both encoder corpora are
batched exactly as the reference batches them (ad+query images together,
support+ad clouds together — few_shot.py:84-102), the prototype is a mean
over support features (:104), and the decoder runs on the concatenated
conditioning.

Episode tensors here are single-class (n_way == 1, which the reference
hardcodes — ``src/datasets/modelnet.py:106``, SURVEY.md §5.1 item 9):

    xs   (S, H, W, 3)   support images        (unused by the loss, kept for
                                               interface parity)
    xq   (Q, H, W, 3)   query images
    xad  (S, H, W, 3)   auxiliary ("ad") images drawn across all classes
    pcs  (S, N, 3)      support point clouds
    pcq  (Q, N, 3)      query point clouds (ground truth)
    pcad (S, N, 3)      auxiliary point clouds

Batching over episodes is done OUTSIDE this module (vmap/shard_map in
fpsg_tpu.parallel), preserving the reference's per-episode BatchNorm
statistics.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fpsg_tpu.nn.decoder import PrimitiveDecoder
from fpsg_tpu.nn.dgcnn import DGCNNFeat
from fpsg_tpu.nn.pointnet import PointNetEncoder
from fpsg_tpu.nn.vgg import ImageEncoder

_AGGREGATORS = ("single", "multi", "mask_single", "mask_multi")


class PCEncoder(nn.Module):
    """Backbone selector (``src/models/point_cloud_net.py:21-35``).

    The param tree nests ``pc_encoder.pointnet_feat_extractor...`` to mirror
    the torch state-dict layout of the shipped pretrained checkpoints
    (SURVEY.md §3.3), making ingestion a mechanical key map.
    """

    core: str = "pointnet"
    axis_name: Optional[str] = None
    point_axis_name: Optional[str] = None  # 'sp' point-axis mesh axis
    dtype: Optional[jnp.dtype] = None
    precise_stats: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.core == "pointnet":
            return PointNetEncoder(
                axis_name=self.axis_name,
                point_axis_name=self.point_axis_name, dtype=self.dtype,
                precise_stats=self.precise_stats, name="pc_encoder"
            )(x, train)
        if self.core == "dgcnn":
            # kNN crosses shard boundaries: the sp path routes neighbor
            # aggregation through the two-pass ring
            # (parallel/sp.py:ring_knn_aggregate)
            return DGCNNFeat(axis_name=self.axis_name,
                             point_axis_name=self.point_axis_name,
                             dtype=self.dtype,
                             precise_stats=self.precise_stats,
                             name="pc_encoder")(x, train)
        raise NotImplementedError(
            f"Unsupported Point Cloud Encoder Core: {self.core}"
        )


class ImgPCProtoNet(nn.Module):
    """Few-shot single-image point-cloud generator."""

    img_backbone: str = "vgg_16"
    pc_backbone: str = "pointnet"
    num_clusters: int = 4
    num_nodes: int = 4
    num_points: int = 2048
    bottleneck_size: int = 1536
    ori_dim: int = 2
    raw_dim: int = 3
    template_type: str = "SQUARE"
    activation: str = "relu"
    query_factor: float = 1.0
    support_factor: float = 1.0
    metric: str = "cd"
    intra_support: bool = False
    aggregate: str = "single"
    axis_name: Optional[str] = None
    point_axis_name: Optional[str] = None  # 'sp' mesh axis the point dim
                                           # of the episode clouds (and the
                                           # generated cloud) is sharded
                                           # over — call inside shard_map
                                           # with cloud specs P(None,'sp',
                                           # None); clouds scale past one
                                           # chip (parallel/sp.py, DESIGN
                                           # §19). metric='cd' only
                                           # (ring chamfer); both
                                           # pointnet and dgcnn cores.
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)
    fused_conv: bool = False     # fused Pallas conv+BN chain for the VGG
                                 # image branch in train mode
                                 # (fpsg_tpu.ops.conv3x3)
    winograd: bool = False       # Winograd F(2,3) VGG convs (4/9 MACs,
                                 # LSB rounding only; fpsg_tpu.ops.winograd)
    decoder_fused: str = "auto"  # decoder node-chain execution (see
                                 # nn/decoder.py `fused`): 'auto' = Pallas
                                 # fused kernels on TPU, XLA elsewhere;
                                 # 'off' = the portable XLA path (same
                                 # params, equivalence-tested) — used by
                                 # serve_export (Pallas cannot lower
                                 # symbolic-batch blocks)
    precise_stats: bool = False  # two-pass BN variance everywhere: exact
                                 # reference-trajectory stats (the parity
                                 # tests run in this mode); default is the
                                 # single-read shifted form — ~1e-7 stat
                                 # drift, measurably faster (BASELINE.md)
    remat: bool = False  # rematerialize encoder/decoder activations in the
                         # backward pass (HBM traffic ↔ recompute trade)

    def setup(self):
        if self.aggregate not in _AGGREGATORS:
            raise NotImplementedError(
                f"Found unsupported prototype aggregation: {self.aggregate}"
            )
        if self.aggregate in ("multi", "mask_multi"):
            # Reference accepts these flags but only 'single' semantics are
            # implemented (few_shot.py:49-52, SURVEY.md §5.1 item 10).
            warnings.warn(
                f"aggregate='{self.aggregate}' behaves as 'single' "
                "(reference parity: multi modes are inert)"
            )
        # 'mask_single' is ACTIVE here (extension): the reference ships a
        # complete FCMaskAlloacter but never wires it (build_model passes
        # mask_allocater=None, trainNetwork.py:54). We realize the evident
        # intent: a sigmoid mask over prototype dims predicted from
        # [img_feat ‖ proto], gating the prototype per query.
        if self.metric not in ("cd", "emd"):
            raise NotImplementedError(
                "Found unsupported point cloud reconstruction metrics: "
                f"{self.metric}"
            )
        if self.point_axis_name is not None and self.metric != "cd":
            raise NotImplementedError(
                "point-axis (sp) sharding supports metric='cd' (ring "
                "chamfer); Sinkhorn-EMD needs the full row/col reductions"
            )
        img_cls = nn.remat(ImageEncoder, static_argnums=(2,)) \
            if self.remat else ImageEncoder
        dec_cls = nn.remat(PrimitiveDecoder, static_argnums=(2,)) \
            if self.remat else PrimitiveDecoder
        self.img_encoder = img_cls(
            backbone=self.img_backbone, axis_name=self.axis_name,
            dtype=self.dtype, precise_stats=self.precise_stats,
            fused_conv=self.fused_conv, winograd=self.winograd,
            name="img_encoder",
        )
        self.pc_encoder = PCEncoder(
            core=self.pc_backbone, axis_name=self.axis_name,
            point_axis_name=self.point_axis_name,
            dtype=self.dtype, precise_stats=self.precise_stats,
            name="pc_encoder_wrap",
        )
        if self.aggregate == "mask_single":
            from fpsg_tpu.models.support import FCMaskAllocater

            proto_dim = self.bottleneck_size - 512  # img branch is 512-d
            self.mask_allocater = FCMaskAllocater(
                proto_dim=proto_dim, axis_name=self.axis_name,
                name="mask_allocater",
            )
        else:
            self.mask_allocater = None
        self.pc_decoder = dec_cls(
            num_clusters=self.num_clusters,
            num_nodes=self.num_nodes,
            num_points=self.num_points,
            bottleneck_size=self.bottleneck_size,
            ori_dim=self.ori_dim,
            raw_dim=self.raw_dim,
            template_type=self.template_type,
            activation=self.activation,
            axis_name=self.axis_name,
            point_axis_name=self.point_axis_name,
            dtype=self.dtype,
            precise_stats=self.precise_stats,
            fused=self.decoder_fused,
            name="pc_decoder",
        )

    # -- shared encode path (few_shot.py:84-107) ---------------------------

    def _encode(self, sample: Dict[str, jax.Array], train: bool):
        xq, xad = sample["xq"], sample["xad"]
        pcs, pcad = sample["pcs"], sample["pcad"]
        n_support, n_query = xad.shape[0], xq.shape[0]

        # Images: [ad ‖ query] in one batch.
        img_corpus = jnp.concatenate([xad, xq], axis=0)
        img_z = self.img_encoder(img_corpus, train)
        img_zad, img_zq = img_z[:n_support], img_z[n_support:]

        # Point clouds: [support ‖ ad] in one batch.
        pc_corpus = jnp.concatenate([pcs, pcad], axis=0)
        pc_z = self.pc_encoder(pc_corpus, train)
        pc_z_proto = pc_z[:n_support]
        pc_z_ad = pc_z[n_support:]

        # Class-specific shape prior: mean of support features (:104).
        proto = jnp.mean(pc_z_proto, axis=0, keepdims=True)
        proto_mat_q = jnp.broadcast_to(
            proto, (n_query, proto.shape[-1])
        )
        if self.mask_allocater is not None:
            mask = self.mask_allocater(
                jnp.concatenate([img_zq, proto_mat_q], axis=1), train
            )
            proto_mat_q = proto_mat_q * mask
        return img_zad, img_zq, pc_z_ad, proto_mat_q

    def _pc_metric(self, syn: jax.Array, ref: jax.Array) -> jax.Array:
        # Imported lazily to keep module import light under linen transforms.
        from fpsg_tpu.ops.chamfer import chamfer_distance
        from fpsg_tpu.ops.emd import sinkhorn_emd

        if self.point_axis_name is not None:
            # syn/ref are LOCAL point shards: the ring computes the
            # global chamfer without ever materializing a full cloud on
            # one device (parallel/sp.py).
            from fpsg_tpu.parallel.sp import ring_chamfer

            return ring_chamfer(syn, ref, self.point_axis_name).sum()
        if self.metric == "cd":
            return chamfer_distance(syn, ref).sum()
        # Training loss: cheap entropic settings — gradients only need the
        # transport plan's direction; the EVAL metric (reconstruct) uses
        # the accurate defaults (<1% of exact EMD, ops/emd.py docstring).
        return sinkhorn_emd(syn, ref, reduce="sum", eps=0.01, n_iters=100)

    # -- public entry points ----------------------------------------------

    def __call__(self, sample: Dict[str, jax.Array], train: bool = True):
        return self.loss(sample, train)

    def loss(
        self,
        sample: Dict[str, jax.Array],
        train: bool = True,
        template_points: Optional[Dict[str, jax.Array]] = None,
    ) -> Dict[str, Any]:
        """Training objective (few_shot.py:63-129).

        ``template_points`` optionally pins the decoder's template samples
        (dict with 'query' / 'support' arrays of shape (B, C, Nn, P, ori))
        instead of drawing them from the 'template' RNG stream — used by
        golden-parity tests that must feed both frameworks identical
        randomness.
        """
        tp = template_points or {}
        img_zad, img_zq, pc_z_ad, proto_mat_q = self._encode(sample, train)

        syn_q = self.pc_decoder(
            jnp.concatenate([img_zq, proto_mat_q], axis=1), train,
            tp.get("query"),
        )
        loss_rec_q = self._pc_metric(syn_q, sample["pcq"])

        if self.intra_support:
            # Intra-support reconstruction conditions on per-sample ad
            # features, not the prototype (few_shot.py:112-117).
            syn_s = self.pc_decoder(
                jnp.concatenate([img_zad, pc_z_ad], axis=1), train,
                tp.get("support"),
            )
            loss_rec_s = self._pc_metric(syn_s, sample["pcad"])
        else:
            loss_rec_s = jnp.zeros((), jnp.float32)

        loss_recon = (
            self.query_factor * loss_rec_q + self.support_factor * loss_rec_s
        )
        return {
            "ttl_loss": loss_recon,
            "recon_loss": loss_recon,
            "query_rec_loss": loss_rec_q,
            "support_rec_loss": loss_rec_s,
        }

    def reconstruct(self, sample: Dict[str, jax.Array]) -> Dict[str, Any]:
        """Eval path: CD and EMD on the query set
        (``_return_reconstruction``, few_shot.py:131-176)."""
        from fpsg_tpu.ops.chamfer import chamfer_distance
        from fpsg_tpu.ops.emd import sinkhorn_emd

        _, img_zq, _, proto_mat_q = self._encode(sample, train=False)
        syn_q = self.pc_decoder(
            jnp.concatenate([img_zq, proto_mat_q], axis=1), train=False
        )
        cd = chamfer_distance(syn_q, sample["pcq"]).sum()
        emd = sinkhorn_emd(syn_q, sample["pcq"], reduce="sum")
        return {
            "cd_loss": self.query_factor * cd,
            "emd_loss": emd,
            "syn_pc": syn_q,
        }

    def encode_prototype(self, pcs: jax.Array) -> jax.Array:
        """Class prototype ``(F,)`` from a support cloud set ``(S, N, 3)``
        (the mean shape embedding of few_shot.py:179-213). Split out of
        :meth:`generate` so serving can compute it ONCE per class and
        amortize the PointNet encode across every subsequent query."""
        pc_z = self.pc_encoder(pcs, False)
        return jnp.mean(pc_z, axis=0)

    def generate_from_proto(
        self,
        xq: jax.Array,
        proto: jax.Array,
        template_points: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Synthesize query clouds from a precomputed class prototype
        (the query-dependent remainder of :meth:`generate`).

        ``template_points`` optionally pins the decoder's template samples
        (shape (B, C, Nn, P, ori)) instead of drawing one batch-wide
        sample from the 'template' RNG stream. Serving uses this with
        PER-ITEM draws (:func:`per_item_template_points`) so a request's
        output does not depend on which other requests it was batched
        with (dynamic batching stays semantically invisible).

        ``proto`` is either one shared class prototype ``(F,)`` or a
        PER-ITEM batch ``(B, F)`` — the latter lets the dynamic batcher
        (serve_http.py) coalesce requests for different classes into one
        device dispatch (row i only ever sees proto row i)."""
        return self.decode_from_embedding(
            self.img_encoder(xq, False), proto, template_points)

    def decode_from_embedding(
        self,
        img_z: jax.Array,
        proto: jax.Array,
        template_points: Optional[jax.Array] = None,
    ) -> jax.Array:
        """The decoder remainder of :meth:`generate_from_proto`, from a
        precomputed (B, 512) image embedding. Split out so alternative
        image-encoder paths (the int8-quantized serving VGG,
        fpsg_tpu/serve_quant.py) reuse the identical decode."""
        n_query = img_z.shape[0]
        if proto.ndim == 1:
            proto_mat_q = jnp.broadcast_to(
                proto[None], (n_query, proto.shape[-1]))
        else:
            if proto.shape[0] != n_query:
                raise ValueError(
                    f"per-item proto batch {proto.shape} for {n_query} "
                    "query images")
            proto_mat_q = proto
        return self.pc_decoder(
            jnp.concatenate([img_z, proto_mat_q], axis=1), train=False,
            template_points=template_points,
        )

    def generate(self, sample: Dict[str, jax.Array]) -> jax.Array:
        """Synthesize query clouds (draw_reconstruction forward path,
        few_shot.py:179-213): prototype from the SUPPORT set (not ad)."""
        proto = self.encode_prototype(sample["pcs"])
        return self.generate_from_proto(sample["xq"], proto)


def per_item_template_points(model: ImgPCProtoNet, keys: jax.Array
                             ) -> jax.Array:
    """Per-item decoder template samples: one independent draw per key.

    Returns (B, C, Nn, P, ori) uniform/sphere samples where row i is a
    pure function of ``keys[i]`` alone — NOT of the batch size or of the
    other rows. This is what makes dynamic batching semantically
    invisible in serving (fpsg_tpu/serve_http.py): a request generated
    inside a coalesced batch is bit-identical to the same request served
    alone, because its template draw (the only randomness in generation)
    is keyed per item. Contrast the training path, which draws ONE
    batch-wide sample from the 'template' RNG stream (decoder.py:185).

    Args:
      model: the generator model (template config is read off it).
      keys: (B,) typed PRNG key array (e.g. ``jax.random.split(k, B)``).
    """
    from fpsg_tpu.nn.templates import get_template

    template = get_template(model.template_type)
    if template.dim != model.ori_dim:
        raise ValueError(
            f"template dim {template.dim} != ori_dim {model.ori_dim}")
    c, n = model.num_clusters, model.num_nodes
    ppn = model.num_points // c // n

    def draw(k):
        return template.get_random_points(k, (c, n, ppn, model.ori_dim))

    return jax.vmap(draw)(keys)
