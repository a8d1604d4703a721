from .alternatives import (
    BahdanauAttention,
    CBHGLayer,
    CBHLayer,
    ConvLengthPredictor,
    HighwayLayer,
    LSTMDecoder,
    TacotronDecoder,
    TacotronEncoder,
)
from .attention import (
    CrossAttentionBlock,
    MultiHeadAttention,
    SelfAttentionBlock,
    attention_mask,
    masked_attention_xla,
)
from .decoder import TransformerDecoder
from .encoder import TransformerEncoder
from .flow import ActNorm, InvertibleLinear, TransformerCoupling, TransformerTransform
from .layers import (
    FFN,
    Conv1D,
    ConvPreNet,
    PostNet,
    PreNet,
    positional_encoding,
    sequence_mask,
)
from .length_predictor import DenseLengthPredictor, pinball_log_loss
from .posterior import TransformerPosterior, gaussian_log_probability, reparameterize
from .prior import TransformerPrior
from .vaenar import VAENAR, merge_flow_init

__all__ = [
    "VAENAR",
    "BahdanauAttention",
    "CBHGLayer",
    "CBHLayer",
    "ConvLengthPredictor",
    "HighwayLayer",
    "LSTMDecoder",
    "TacotronDecoder",
    "TacotronEncoder",
    "merge_flow_init",
    "CrossAttentionBlock",
    "MultiHeadAttention",
    "SelfAttentionBlock",
    "attention_mask",
    "masked_attention_xla",
    "TransformerDecoder",
    "TransformerEncoder",
    "ActNorm",
    "InvertibleLinear",
    "TransformerCoupling",
    "TransformerTransform",
    "FFN",
    "Conv1D",
    "ConvPreNet",
    "PostNet",
    "PreNet",
    "positional_encoding",
    "sequence_mask",
    "DenseLengthPredictor",
    "TransformerPosterior",
    "gaussian_log_probability",
    "reparameterize",
    "TransformerPrior",
]
