"""Tmall-specific per-column preprocess hooks
(reference: fuxictr/datasets/tmall.py:25-36)."""

from datetime import date

from ..feature_encoder import FeatureEncoder as BaseFeatureEncoder


class FeatureEncoder(BaseFeatureEncoder):
    def convert_weekday(self, df, col_name):
        def _convert_weekday(timestamp):
            dt = date(2014, int(timestamp[:-2]), int(timestamp[-2:]))
            return dt.strftime("%w")
        return df["time_stamp"].apply(_convert_weekday)

    def convert_weekend(self, df, col_name):
        def _convert_weekend(timestamp):
            dt = date(2014, int(timestamp[:-2]), int(timestamp[-2:]))
            return "1" if dt.strftime("%w") in ["6", "0"] else "0"
        return df["time_stamp"].apply(_convert_weekend)
