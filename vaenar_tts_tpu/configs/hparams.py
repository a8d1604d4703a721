"""Hyper-parameter trees for VAENAR-TTS TPU.

Frozen dataclasses (hashable, so they can ride along as static jit arguments)
replacing the reference's nested-class config trees
(reference: configs/hparams.py:233-474). Two presets with behavior parity:
``LJSpeechConfig`` (reference LJHPS, hparams.py:233) and ``DataBakerConfig``
(reference DataBakerHPS, hparams.py:351). Knob names match the reference where
sensible so a user of the reference finds the same dials.

TPU-specific additions (no reference counterpart):
  * ``TrainConfig.use_pallas_attention`` - fused Pallas attention kernel switch
  * ``TrainConfig.compute_dtype`` - bf16/fp32 matmul policy for the transformer
    stacks (the flow prior always runs fp32: slogdet / matrix inverse)
  * ``DatasetConfig.mel_bucket / text_bucket`` - static-shape length bucketing
    (replaces TF dynamic padded_batch, reference tf_record_utils.py:136-138)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class TrainConfig:
    # reference: hparams.py:234-251
    random_seed: int = 123456
    epochs: int = 2000
    warm_epochs: int = 0
    train_batch_size: int = 32
    test_batch_size: int = 8
    test_interval: int = 50
    shuffle: bool = True
    num_samples: int = 1
    length_weight: float = 1.0
    kl_weight: float = 1.0
    kl_weight_init: float = 1e-5
    kl_weight_increase_epoch: int = 1
    kl_weight_end: float = 1e-5
    learning_rate: float = 1.25e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-7
    reduction_factors: Tuple[int, ...] = (5, 4, 3, 2)
    reduce_interval: Tuple[int, ...] = (0, 200, 400, 600)
    # TPU-native knobs (new).
    # use_pallas_attention: fused VMEM-resident attention kernel (forward AND
    # flash backward, ops/flash_attention.py). False/"off", True/"on", or
    # "auto": at the shipped short shapes (heads=4, head_dim=64, T<=512) XLA
    # wins (kernel launch overhead dominates and XLA fuses the surrounding
    # projections); from T=768 the flash kernel wins (2x fwd at 768 growing
    # to 6x at 4096, pull-synced measurements in scripts/perf_ab_attn.py),
    # so "auto" selects it past the measured crossover (pallas_profitable);
    # shapes are static, so selection is trace-time-only.
    use_pallas_attention: Any = "auto"
    compute_dtype: str = "bfloat16"  # transformer matmul dtype; flow stays fp32
    # Activation checkpointing over every transformer block (encoder/decoder/
    # posterior self+cross blocks and the flow couplings' conditioning nets):
    # "off" keeps all activations live; "on" rematerializes each block in the
    # backward (jax.checkpoint, nothing saved); "dots" saves matmul outputs
    # and recomputes only elementwise ops (jax.checkpoint_policies
    # .dots_saveable). Trades recompute FLOPs for HBM - the measured batch-
    # scaling wall past batch 32 (README) is activation-memory bound.
    remat: str = "off"
    # Gradient accumulation: split each train batch into this many equal
    # micro-batches, lax.scan the fwd+bwd over them, average the gradients,
    # and apply ONE optimizer update. The measured per-chip batch-scaling
    # wall (README: 64->68.6 ms, 128->192.6 ms vs 28.8 ms at 32) is HBM
    # bandwidth - per-op working sets outgrow VMEM past batch 32 - so a
    # global batch of 128 runs fastest as 4 micro-steps at the batch-32
    # optimum. Semantics vs one full-batch step: the kl hinge max(kl,0)
    # (reference train.py:135) clamps the per-micro-batch mean, and
    # BatchNorm moments are per micro-batch - both identical in the trained
    # regime (kl > 0) up to reassociation. Batch size must divide evenly.
    grad_accum: int = 1
    # Measured-crossover tuning thresholds, config-visible so benchmarks,
    # the driver dryrun and deployments can move them without touching
    # module globals (VERDICT r3 #7). Both are trace-time statics threaded
    # to the attention modules as models.attention.AttentionTuning.
    # ring_min_seq: minimum self-attention sequence length for the ppermute
    # ring (parallel/ring_attention.py) to beat one local fused attention;
    # unmeasurable without real multi-chip ICI, kept at the analytical
    # default. 0 forces the ring whenever shapes divide the mesh.
    ring_min_seq: int = 1024
    # pallas_min_score_elements: tq*tk above which "auto" picks the fused
    # Pallas kernel. 0 = use the measured per-head_dim table
    # (ops/flash_attention.PALLAS_MIN_SCORE_ELEMENTS_BY_HEAD_DIM); >0
    # overrides it globally.
    pallas_min_score_elements: int = 0
    # Device-resident dataset cache (TPU-native). The train loop normally
    # re-uploads every batch every epoch; over a tunnel-attached chip that
    # host->device transfer dominates the epoch (measured round 5: 5.8 s/
    # epoch wall vs ~0.9 s of step compute on the toy-v2 corpus, ~147 MB
    # re-sent per epoch). When the whole train split fits in this many MB
    # and every batch shares ONE static shape, the loop uploads the stacked
    # batches to HBM once and runs each epoch as a single jitted lax.scan
    # over on-device gathers (training/steps.py::make_epoch_runner) — only
    # a ~100-byte batch-order array crosses the link per epoch. 0 disables
    # (streaming path, reference-shaped: tf.data feeds the step each batch,
    # reference train.py:269-286).
    device_data_cache_mb: int = 0
    # With the cache on: run the whole epoch as ONE jitted lax.scan dispatch
    # (true single-RPC epochs) instead of dispatching the per-batch
    # train_step over on-device gathers. The scan program compiles fine
    # locally (CPU A/B: 68 s vs 53 s for the bare step) but its REMOTE
    # compile on the tunnel-attached chip never completed in 2x20 min
    # (round 5), so per-step dispatch over cached batches is the default —
    # it keeps the transfer win (only index scalars cross the link) and
    # reuses the already-proven step program. Flip on direct-attached
    # hardware where the compiler service is local.
    device_cache_epoch_scan: bool = False
    checkpoint_max_to_keep: int = 20
    checkpoint_keep_every_n_hours: float = 4.0
    # reference saves every epoch (train.py:304-306); raise when epochs are
    # seconds long and the save dominates wall time
    checkpoint_every_n_epochs: int = 1

    def kl_weight_at(self, epoch: int) -> float:
        """KL-anneal schedule (reference train.py:229-233, :270)."""
        step = (self.kl_weight_end - self.kl_weight_init) / self.kl_weight_increase_epoch
        if epoch <= self.kl_weight_increase_epoch:
            return self.kl_weight_init + step * epoch
        return self.kl_weight_end

    def reduction_factor_at(self, epoch: int) -> int:
        """Reduction-factor curriculum (reference train.py:236-243)."""
        i = 0
        while i < len(self.reduce_interval) and self.reduce_interval[i] <= epoch:
            i += 1
        i = i - 1 if i > 0 else 0
        return self.reduction_factors[i]


@dataclass(frozen=True)
class DatasetConfig:
    # reference: hparams.py:253-258
    record_split: int = 8
    dev_set_rate: float = 0.01
    test_set_rate: float = 0.01
    # static-shape bucketing (TPU-native; replaces dynamic padded_batch)
    mel_bucket: int = 120  # multiple of lcm(2,3,4,5)=60 so every r divides it
    text_bucket: int = 32


@dataclass(frozen=True)
class TextConfig:
    # reference: hparams.py:260-264
    pad: str = "_"
    bos: str = "^"
    eos: str = "~"
    characters: str = "_^~abcdefghijklmnopqrstuvwxyz!'\"(),-.:;? []"


@dataclass(frozen=True)
class AudioConfig:
    # reference: hparams.py:266-282
    num_mels: int = 80
    num_freq: int = 1025
    min_mel_freq: float = 0.0
    max_mel_freq: float = 8000.0
    sample_rate: int = 22050
    frame_length_sample: int = 1024
    frame_shift_sample: int = 256
    n_mfcc: int = 13
    preemphasize: float = 0.97
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    max_abs_value: float = 1.0
    symmetric_specs: bool = False
    griffin_lim_iters: int = 60
    power: float = 1.5
    center: bool = True

    @property
    def n_fft(self) -> int:
        # reference audio/audio.py:153-159
        return (self.num_freq - 1) * 2


@dataclass(frozen=True)
class CommonConfig:
    # reference: hparams.py:284-289
    latent_dim: int = 128
    output_dim: int = 80
    final_reduction_factor: int = 2
    max_reduction_factor: int = 5
    mel_text_len_ratio: float = 5.59


@dataclass(frozen=True)
class EncoderConfig:
    # reference: hparams.py:291-306 (Encoder.Transformer)
    vocab_size: int = 43
    embd_dim: int = 512
    n_conv: int = 3
    pre_hidden: int = 512
    conv_kernel: int = 5
    pre_activation: str = "relu"
    pre_drop_rate: float = 0.1
    pos_drop_rate: float = 0.1
    bn_before_act: bool = False
    n_blk: int = 4
    attention_dim: int = 256
    attention_heads: int = 4
    attention_temperature: float = 1.0
    ffn_hidden: int = 1024


@dataclass(frozen=True)
class DecoderConfig:
    # reference: hparams.py:308-321 (Decoder.Transformer)
    nblk: int = 2
    attention_dim: int = 256
    attention_heads: int = 4
    attention_temperature: float = 1.0
    ffn_hidden: int = 1024
    post_n_conv: int = 5
    post_conv_filters: int = 256
    post_conv_kernel: int = 5
    post_drop_rate: float = 0.2


@dataclass(frozen=True)
class PosteriorConfig:
    # reference: hparams.py:323-334 (Posterior.Transformer)
    pre_hidden: int = 256
    pos_drop_rate: float = 0.2
    pre_drop_rate: float = 0.5
    pre_activation: str = "relu"
    nblk: int = 2
    attention_dim: int = 256
    attention_heads: int = 4
    temperature: float = 1.0
    ffn_hidden: int = 1024


@dataclass(frozen=True)
class PriorConfig:
    # reference: hparams.py:336-344 (Prior.Transformer)
    n_blk: int = 6
    n_transformer_blk: int = 2
    attention_dim: int = 256
    attention_heads: int = 4
    temperature: float = 1.0
    ffn_hidden: int = 1024
    inverse: bool = False
    # Factor all invertible-linear weights with one batched LU per step
    # (models/prior.py::_linear_precompute) instead of per-layer
    # inv/slogdet custom calls. Same math (test-enforced); measured on the
    # attached TPU v5e the per-layer path is 1.0 ms/step FASTER (28.8 vs
    # 29.8 ms, scripts/perf_ab_train.py --batched_lu on|off) — the batched
    # lu_solve + pivot loop serializes worse than XLA's per-layer
    # inverses — so the default is off.
    batched_lu: bool = False


@dataclass(frozen=True)
class LengthPredictorConfig:
    # reference: hparams.py:346-348 (LengthPredictor.Dense)
    activation: str = "identity"
    # > 0 trains a second Dense(1) head with a pinball loss at this quantile
    # (e.g. 0.9 -> p90 lengths) for inference headroom against free-text
    # truncation; 0 = reference-exact (mean head only). Beyond the
    # reference; see models/length_predictor.py.
    quantile: float = 0.0


@dataclass(frozen=True)
class HParams:
    """Root config tree; one instance per dataset preset."""

    name: str = "ljspeech"
    train: TrainConfig = field(default_factory=TrainConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    text: TextConfig = field(default_factory=TextConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    common: CommonConfig = field(default_factory=CommonConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    decoder: DecoderConfig = field(default_factory=DecoderConfig)
    posterior: PosteriorConfig = field(default_factory=PosteriorConfig)
    prior: PriorConfig = field(default_factory=PriorConfig)
    length_predictor: LengthPredictorConfig = field(default_factory=LengthPredictorConfig)

    def replace(self, **kwargs) -> "HParams":
        return dataclasses.replace(self, **kwargs)


def LJSpeechConfig() -> HParams:
    """LJSpeech preset (reference LJHPS, hparams.py:233-348)."""
    return HParams(name="ljspeech")


def DataBakerConfig() -> HParams:
    """DataBaker Mandarin preset (reference DataBakerHPS, hparams.py:351-474)."""
    return HParams(
        name="databaker",
        train=TrainConfig(random_seed=12),
        text=TextConfig(characters="_^~abcdefghijklmnopqrstuvwxyz12345,./- "),
        audio=AudioConfig(
            sample_rate=16000,
            frame_length_sample=800,
            frame_shift_sample=200,
            min_level_db=-115.0,
        ),
        common=CommonConfig(mel_text_len_ratio=4.21),
        encoder=EncoderConfig(vocab_size=39),
    )


_PRESETS = {
    "ljspeech": LJSpeechConfig,
    "databaker": DataBakerConfig,
}


def get_config(name: str, **overrides) -> HParams:
    """Look up a preset by CLI name (reference train.py:50) with overrides."""
    if name not in _PRESETS:
        raise KeyError(f"unknown dataset preset {name!r}; choices: {sorted(_PRESETS)}")
    hp = _PRESETS[name]()
    return hp.replace(**overrides) if overrides else hp


def tiny_test_config(vocab_size: int = 43) -> HParams:
    """A miniature config for fast unit/integration tests (no reference analog)."""
    return HParams(
        name="tiny",
        train=TrainConfig(
            train_batch_size=2,
            test_batch_size=2,
            compute_dtype="float32",
            use_pallas_attention=False,
        ),
        encoder=EncoderConfig(
            vocab_size=vocab_size, embd_dim=32, n_conv=2, pre_hidden=32,
            conv_kernel=3, n_blk=2, attention_dim=16, attention_heads=2,
            ffn_hidden=32,
        ),
        decoder=DecoderConfig(
            nblk=1, attention_dim=16, attention_heads=2, ffn_hidden=32,
            post_n_conv=2, post_conv_filters=16, post_conv_kernel=3,
        ),
        posterior=PosteriorConfig(
            pre_hidden=16, nblk=1, attention_dim=16, attention_heads=2,
            ffn_hidden=32,
        ),
        prior=PriorConfig(
            n_blk=2, n_transformer_blk=1, attention_dim=16, attention_heads=2,
            ffn_hidden=32,
        ),
        common=CommonConfig(latent_dim=8, output_dim=80),
    )
