from .cross_intra_block import fused_cross_intra_block, cross_intra_block_reference
from .bm25_scan import (bm25_score_chunk, bm25_score_chunk_pallas,
                        bm25_score_chunk_reference)
