from .initializers import embedding_init, xavier_normal
from .embedding import (EmbeddingSpec, PackedEmbedding, LabelEmbedding,
                        MergedEmbeddingLayer)
from .feature_embedding import (FeatureEmbedding, FeatureEmbeddingDict,
                                parse_feature_encoder)
from .layers import (MLPLayer, LRLayer, FMLayer, PreNorm, PreNormAttention,
                     PreNormFeedForward, FeedForward, Attention, Transformer)
from .encoders import (CrossIntraEncoder, CrossIntraEncoderPA, JointEncoder,
                       CascadeEncoder)
from .interaction import (InnerProductLayer, BilinearInteractionLayer,
                          HolographicInteractionLayer, CrossNet,
                          CrossInteractionLayer, CompressedInteractionNet,
                          InteractionMachine)
from .attention_lib import (scaled_dot_product_attention,
                            SqueezeExcitationLayer, Dice, DIN_Attention,
                            MultiHeadTargetAttention, k_max_pooling)
from .graph import FiGNN_Layer, GraphLayer, HypergraphLayer, PET_Layer
from .deep import APGLinear, APGMLPLayer, MLPBlock
