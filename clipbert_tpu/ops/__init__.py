from clipbert_tpu.ops.layernorm import layer_norm
from clipbert_tpu.ops.activations import ACT2FN
from clipbert_tpu.ops.attention import multi_head_attention
from clipbert_tpu.ops.dropout import dropout
from clipbert_tpu.ops.linear import linear
