"""Synthetic CTR dataset generator.

The reference repo ships no data (data/ holds .gitkeep placeholders),
so tests and benchmarks use synthetic datasets with the ML-Tag shape:
3 categorical fields (user/item/tag) and a binary label driven by
latent user-item affinities, which gives retrieval-augmented models a
learnable signal (neighbors sharing ids carry label information).
"""

import os

import numpy as np
import pandas as pd


def make_mltag_like(out_dir, n_train=20000, n_valid=4000, n_test=4000,
                    n_users=500, n_items=300, n_tags=100, seed=0):
    rng = np.random.RandomState(seed)
    n = n_train + n_valid + n_test
    user = rng.randint(0, n_users, n)
    item = rng.randint(0, n_items, n)
    tag = rng.randint(0, n_tags, n)
    # latent affinity: label depends on stable user/item/tag propensities
    u_bias = rng.normal(0, 1.2, n_users)
    i_bias = rng.normal(0, 1.2, n_items)
    t_bias = rng.normal(0, 0.8, n_tags)
    u_vec = rng.normal(0, 1, (n_users, 4))
    i_vec = rng.normal(0, 1, (n_items, 4))
    logits = (u_bias[user] + i_bias[item] + t_bias[tag]
              + (u_vec[user] * i_vec[item]).sum(-1) * 0.7)
    prob = 1.0 / (1.0 + np.exp(-logits))
    label = (rng.uniform(size=n) < prob).astype(np.float64)
    df = pd.DataFrame({"user_id": user.astype(np.float64),
                       "item_id": item.astype(np.float64),
                       "tag_id": tag.astype(np.float64),
                       "label": label})
    os.makedirs(out_dir, exist_ok=True)
    df.iloc[:n_train].to_csv(os.path.join(out_dir, "train.csv"), index=False)
    df.iloc[n_train:n_train + n_valid].to_csv(
        os.path.join(out_dir, "valid.csv"), index=False)
    df.iloc[n_train + n_valid:].to_csv(os.path.join(out_dir, "test.csv"), index=False)
    return df


def make_kkbox_like(out_dir, n_train=8000, n_valid=2000, n_test=2000,
                    n_users=300, n_songs=200, n_genres=30, seed=0):
    """KKBox-shaped synthetic set: categorical user/song plus a
    genre_ids SEQUENCE column ('|'-separated, variable length) — the
    field shape that exercises the sequence tokenizer, pooled packed
    embedding, and the retrieval used_cols plumbing end to end
    (reference config: configs/datasets/kkbox_x1.yaml:10-13)."""
    rng = np.random.RandomState(seed)
    n = n_train + n_valid + n_test
    user = rng.randint(0, n_users, n)
    song = rng.randint(0, n_songs, n)
    # each song has 1-3 stable genres; rows list them in random order
    song_genres = [rng.choice(n_genres, size=rng.randint(1, 4),
                              replace=False) for _ in range(n_songs)]
    genres = ["|".join(str(g) for g in
                       rng.permutation(song_genres[s]))
              for s in song]
    u_bias = rng.normal(0, 1.2, n_users)
    s_bias = rng.normal(0, 1.2, n_songs)
    g_bias = rng.normal(0, 0.8, n_genres)
    logits = (u_bias[user] + s_bias[song]
              + np.array([g_bias[song_genres[s]].mean() for s in song]))
    prob = 1.0 / (1.0 + np.exp(-logits))
    label = (rng.uniform(size=n) < prob).astype(np.float64)
    df = pd.DataFrame({"msno": user.astype(np.float64),
                       "song_id": song.astype(np.float64),
                       "genre_ids": genres,
                       "label": label})
    os.makedirs(out_dir, exist_ok=True)
    df.iloc[:n_train].to_csv(os.path.join(out_dir, "train.csv"), index=False)
    df.iloc[n_train:n_train + n_valid].to_csv(
        os.path.join(out_dir, "valid.csv"), index=False)
    df.iloc[n_train + n_valid:].to_csv(os.path.join(out_dir, "test.csv"),
                                       index=False)
    return df
