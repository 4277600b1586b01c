from .initializers import embedding_init, xavier_normal
from .embedding import EmbeddingSpec, PackedEmbedding, LabelEmbedding
from .layers import MLPLayer, LRLayer, PreNorm, FeedForward, Attention, Transformer
from .encoders import (CrossIntraEncoder, CrossIntraEncoderPA, JointEncoder,
                       CascadeEncoder)
