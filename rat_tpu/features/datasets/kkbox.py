"""KKBox-specific per-column preprocess hooks.

Data-format contract from FuxiCTR (fuxictr/datasets/kkbox.py:24-50,
(C) Huawei Technologies, Apache-2.0): the ISRC's first two characters
are the registrant country, and listener ages bucket into decades with
1..95 as the plausible range. The tiny transforms below necessarily
mirror that contract.
"""

import numpy as np
import pandas as pd

from ..feature_encoder import FeatureEncoder as BaseFeatureEncoder

# decade buckets over the valid age range; ages outside [1, 95] and
# missing values map to "" (treated as NA by the tokenizer)
_AGE_EDGES = [10, 20, 30, 40, 50, 60]


class FeatureEncoder(BaseFeatureEncoder):
    def extract_country_code(self, df, col_name):
        # ISRC prefix (2-char registrant country)
        return df[col_name].fillna("").str.slice(0, 2)

    def bucketize_age(self, df, col_name):
        ages = pd.to_numeric(df[col_name], errors="coerce").to_numpy()
        with np.errstate(invalid="ignore"):
            bucket = 1 + np.searchsorted(_AGE_EDGES, np.nan_to_num(ages))
            valid = ~np.isnan(ages) & (ages >= 1) & (ages <= 95)
        return pd.Series(np.where(valid, bucket.astype(str), ""),
                         index=df.index)
