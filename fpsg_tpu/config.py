"""Typed configuration carrying the reference's exact CLI surface.

One dataclass replaces the three duplicated argparse blocks
(``src/trainNetwork.py:211-264``, ``src/evaluate_Network.py:128-181``,
``src/trainPointAE.py:131-153``). Field names/defaults mirror the reference
flags 1:1; framework-specific additions are grouped at the bottom.

Reference bugs handled here (SURVEY.md §5.1):
- ``--sequential_eval`` used ``action='store_ture'`` (typo) and crashed both
  drivers at startup; it works here.
- ``--pc_dist`` was parsed but never forwarded to the model (training was
  always CD); it is forwarded here — the default 'cd' preserves reference
  behavior.
- ``--epoch_start_recon`` is accepted and unused, exactly as in the
  reference.
"""

from __future__ import annotations

import argparse
import dataclasses


@dataclasses.dataclass
class FPSGConfig:
    # Basic parameters — data path, N-way-K-shot, etc.
    config_path: str = ""
    test_path: str = ""
    refer_path: str = "./modelnet_files/"
    dataset: str = "modelnet"
    pc_encoder_path: str = ""
    n_way: int = 1
    n_shot: int = 20
    n_query: int = 0          # 0 → n_shot (trainNetwork.py:71)

    # Network architecture
    img_encoder: str = "vgg_16"
    pc_encoder: str = "pointnet"
    support_factor: float = 1.0
    query_factor: float = 1.0
    intra_recon: bool = False
    epoch_start_recon: int = 0   # parsed-but-unused (reference parity)
    num_clusters: int = 4
    ori_dim: int = 2
    raw_dim: int = 3
    num_nodes: int = 4
    device: str = "tpu"          # reference: 'cuda'; informational here
    bottleneck_size: int = 1536
    template_type: str = "SQUARE"
    activation: str = "relu"
    dim_template: int = 2
    aggregate: str = "single"

    # Training
    n_episode: int = 100
    epoch: int = 500
    lr: float = 1e-3
    lr_decay: int = 350
    resume: int = -1
    pc_dist: str = "cd"
    SGD: bool = False

    # Experiment
    name: str = "0"
    dir_name: str = ""
    model_path: str = "../checkpoint"
    save_interval: int = 50
    sample_interval: int = 10
    eval_interval: int = 20
    eval_model: str = "NONE"
    sequential_eval: bool = False

    # --- framework additions (TPU) ------------------------------------
    seed: int = 0
    episodes_per_step: int = 1   # E>1 batches episodes per optimizer step
    steps_per_call: int = 0      # optimizer steps fused per dispatch via
                                 # lax.scan (0 = auto: largest divisor of
                                 # steps-per-epoch <= 8); amortizes host
                                 # dispatch overhead, identical updates
    img_encoder_path: str = ""   # optional torchvision vgg16_bn weights
    eval_episodes: int = 100     # random-sampler eval episodes
    eval_chunk: int = 16         # episodes per jitted eval dispatch (the
                                 # full eval batch at 32-shot would put
                                 # ~20 GB of VGG activations in HBM; the
                                 # largest divisor of eval_episodes <= this
                                 # is used, keeping one compiled shape)
    npy_folder: str = "./"       # evaluate_Network output dir
    num_pts: int = 2048          # points per cloud (reference hardcodes 2048)
    compute_dtype: str = "f32"   # 'f32' or 'bf16' (mixed precision: params,
                                 # BN stats, and losses stay f32)
    fused_conv: bool = False     # fused Pallas conv+BN chain on the VGG
                                 # image branch (train-mode; TPU only).
                                 # Default OFF by measurement: 17.27 vs
                                 # 18.28 eps A/B even gated to the sites
                                 # the conv probe favored — XLA already
                                 # fuses the BN affine into the conv
                                 # pass, so the chain must beat the XLA
                                 # conv itself and does not (BASELINE.md
                                 # round-3e)
    winograd: bool = False       # Winograd F(2,3) for the unpacked VGG
                                 # convs (fpsg_tpu.ops.winograd): 4/9 the
                                 # MACs in fwd/dgrad/wgrad for 4x-input
                                 # transformed activations in HBM; LSB
                                 # rounding differences only. Default OFF
                                 # pending the TPU probe
                                 # (benchmarks/winograd_probe.py)
    precise_stats: bool = False  # two-pass BN variance everywhere — the
                                 # exact torch-trajectory parity mode
                                 # (PARITY.md round-2 notes); ~5% slower
    bf16_moments: bool = False   # Adam moments stored bf16 (half the
                                 # optimizer HBM state, ~1.4x less update
                                 # traffic; bounded trajectory drift —
                                 # train/optim.py scale_by_adam_compact)
    host_corpus: bool = False    # corpus stays in host RAM; episodes are
                                 # assembled on a prefetch thread (for
                                 # datasets larger than HBM)
    dp: int = 1                  # data-parallel mesh size (episode axis);
                                 # -1 = all visible devices / mp; requires
                                 # episodes_per_step % dp == 0
    mp: int = 1                  # model-parallel mesh size (decoder
                                 # cluster-sharded weights; parallel/mesh.py)
    fsdp: bool = False           # FSDP/ZeRO state sharding: params + Adam
                                 # moments dp-sharded across steps
                                 # (parallel/mesh.py:fsdp_state_sharding);
                                 # requires dp > 1
    transient_retries: int = 2   # in-process replay retries per snapshot
                                 # window on a transient backend failure
                                 # (axon flake bursts poison BOTH the donated
                                 # input state and the step output — CLAUDE.md
                                 # quirks); replay restores (state, rng key)
                                 # from a host snapshot so the trajectory is
                                 # exact. 0 disables (old fail-fast behavior).
                                 # Ignored under --host_corpus: the prefetch
                                 # stream cannot be rewound for exact replay.
    snapshot_interval: int = 0   # epochs between host-side TrainState
                                 # snapshots for transient-retry replay (a
                                 # full device_get). <=0 = AUTO: the loop
                                 # measures its own pull + epoch time and
                                 # picks the interval that keeps snapshot
                                 # overhead <=2% of epoch time — every
                                 # epoch on a local TPU host (~0.1 s pull),
                                 # a handful per run through a thin link
                                 # (38 s pull measured on the dev tunnel).
                                 # A failure replays at most one interval.
    profile_dir: str = ""        # write a jax.profiler trace of one epoch
    export_torch: bool = False   # also save model_epoch_<e>.pt in the
                                 # reference's torch state-dict layout
    dump_reconstructions: bool = False  # eval: write PNG+npy per episode
                                 # (the reference evaluator's OPTION 2 path,
                                 # evaluate_Network.py:111)
    seq_eval_chunk: int = 8      # sequential eval: test items per jitted
                                 # dispatch (chunked vmap; 1 = reference's
                                 # per-item dispatch behavior)
    finetune_layer: int = -1     # >=0: freeze all but the last N image-branch
                                 # convs (the reference's INTENDED behavior;
                                 # its _set_finetune is never called, so the
                                 # faithful default trains everything)

    @property
    def effective_n_query(self) -> int:
        return self.n_shot if self.n_query == 0 else self.n_query

    @property
    def num_points(self) -> int:
        return self.num_pts


def add_train_flags(parser: argparse.ArgumentParser) -> None:
    """The trainNetwork.py flag surface (reference :211-264)."""
    d = FPSGConfig()
    p = parser.add_argument
    p("--config_path", type=str, required=True)
    p("--test_path", type=str, required=True)
    p("--refer_path", type=str, default=d.refer_path)
    p("--dataset", type=str, default="modelnet",
      choices=["modelnet", "shapenet", "synthetic"])
    p("--pc_encoder_path", type=str, default="")
    p("--n_way", type=int, default=d.n_way)
    p("--n_shot", type=int, default=d.n_shot)
    p("--n_query", type=int, default=d.n_query)
    p("--img_encoder", type=str, default=d.img_encoder)
    p("--pc_encoder", type=str, default=d.pc_encoder)
    p("--support_factor", type=float, default=d.support_factor)
    p("--query_factor", type=float, default=d.query_factor)
    p("--intra_recon", action="store_true")
    p("--epoch_start_recon", type=int, default=d.epoch_start_recon)
    p("--num_clusters", type=int, default=d.num_clusters)
    p("--ori_dim", type=int, default=d.ori_dim)
    p("--raw_dim", type=int, default=d.raw_dim)
    p("--num_nodes", type=int, default=d.num_nodes)
    p("--device", type=str, default=d.device)
    p("--bottleneck_size", type=int, default=d.bottleneck_size)
    p("--template_type", type=str, default=d.template_type)
    p("--activation", type=str, default=d.activation)
    p("--dim_template", type=int, default=d.dim_template)
    p("--aggregate", type=str, default=d.aggregate,
      choices=["single", "multi", "mask_single", "mask_multi"])
    p("--n_episode", type=int, default=d.n_episode)
    p("--epoch", type=int, default=d.epoch)
    p("--lr", type=float, default=d.lr)
    p("--lr_decay", type=int, default=d.lr_decay)
    p("--resume", type=int, default=d.resume)
    p("--pc_dist", type=str, default=d.pc_dist, choices=["cd", "emd"])
    p("--SGD", action="store_true")
    p("--name", type=str, default=d.name)
    p("--dir_name", type=str, default=d.dir_name)
    p("--model_path", type=str, default=d.model_path)
    p("--save_interval", type=int, default=d.save_interval)
    p("--sample_interval", type=int, default=d.sample_interval)
    p("--eval_interval", type=int, default=d.eval_interval)
    p("--eval_model", type=str, default=d.eval_model)
    p("--sequential_eval", action="store_true")  # reference typo fixed
    # framework additions
    p("--seed", type=int, default=d.seed)
    p("--episodes_per_step", type=int, default=d.episodes_per_step)
    p("--steps_per_call", type=int, default=d.steps_per_call)
    p("--img_encoder_path", type=str, default=d.img_encoder_path)
    p("--eval_episodes", type=int, default=d.eval_episodes)
    p("--eval_chunk", type=int, default=d.eval_chunk)
    p("--npy_folder", type=str, default=d.npy_folder)
    p("--num_pts", type=int, default=d.num_pts)
    p("--compute_dtype", type=str, default=d.compute_dtype,
      choices=["f32", "bf16"])
    p("--precise_stats", action="store_true")
    p("--bf16_moments", action="store_true")
    p("--fused_conv", dest="fused_conv", action="store_true",
      default=d.fused_conv)
    p("--no_fused_conv", dest="fused_conv", action="store_false")
    p("--winograd", dest="winograd", action="store_true",
      default=d.winograd)
    p("--no_winograd", dest="winograd", action="store_false")
    p("--seq_eval_chunk", type=int, default=d.seq_eval_chunk)
    p("--finetune_layer", type=int, default=d.finetune_layer)
    p("--dump_reconstructions", action="store_true")
    p("--host_corpus", action="store_true")
    p("--dp", type=int, default=d.dp)
    p("--mp", type=int, default=d.mp)
    p("--fsdp", action="store_true")
    p("--transient_retries", type=int, default=d.transient_retries)
    p("--snapshot_interval", type=int, default=d.snapshot_interval)
    p("--profile_dir", type=str, default=d.profile_dir)
    p("--export_torch", action="store_true")


def config_from_args(args: argparse.Namespace) -> FPSGConfig:
    fields = {f.name for f in dataclasses.fields(FPSGConfig)}
    return FPSGConfig(
        **{k: v for k, v in vars(args).items() if k in fields}
    )
