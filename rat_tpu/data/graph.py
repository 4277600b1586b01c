"""PET graph preprocessing (host-side, DGL-free).

Re-implementation of the reference PETGraphProcessor
(fuxictr/datasets/data_utils.py:140-185): per-instance bipartite graphs
of instance and feature nodes, with labels (target instance label id is
2 = [MASK]), bidirectional edges, and global feature-id offsetting.
Instead of DGL graph objects, graphs are plain dicts of numpy arrays
(edge lists + node attributes), consumable by rat_tpu.nn.graph.PET_Layer
after batching with ``batch_graphs`` (disjoint union with offsets —
the dgl.batch equivalent).
"""

import numpy as np

from ..retrieval.similarity import map_indices


class PETGraphProcessor:
    @staticmethod
    def convert_indices(X, feature_specs):
        """Offset each field's ids into one global id space."""
        offset = 0
        X = X.copy()
        for _, feature_spec in feature_specs.items():
            X[..., feature_spec["index"]] += offset
            offset += feature_spec["vocab_size"]
        return X

    @staticmethod
    def build_instance_graph(X_i, y_i):
        """X_i: [F] or [(1+K), F]; y_i: scalar or [(1+K)].
        Returns a dict graph: edge_src/edge_dst/label/original_node_ids/
        is_target/is_instance/is_feature/num_nodes."""
        y_i = np.array(y_i, copy=True)
        if y_i.ndim == 0:
            y_i = np.expand_dims(y_i, axis=0)
        y_i[0] = 2  # [MASK] for the target instance

        count_target_instances = 1
        count_instances = y_i.shape[0]
        feature_nodes = X_i.reshape(-1) + count_instances
        instance_nodes = np.repeat(np.arange(count_instances), X_i.shape[-1])

        all_nodes = np.concatenate((instance_nodes, feature_nodes))
        unique_node_ids = np.unique(all_nodes)
        mapped_instance_nodes = map_indices(unique_node_ids, instance_nodes,
                                            is_key_sorted=True)
        mapped_feature_nodes = map_indices(unique_node_ids, feature_nodes,
                                           is_key_sorted=True)

        edge_src = np.concatenate((mapped_feature_nodes, mapped_instance_nodes))
        edge_dst = np.concatenate((mapped_instance_nodes, mapped_feature_nodes))
        num_nodes = len(unique_node_ids)

        labels = np.concatenate((y_i, [2] * (num_nodes - len(y_i)))).astype(np.int64)
        node_ids = np.arange(num_nodes)
        return {
            "edge_src": edge_src.astype(np.int32),
            "edge_dst": edge_dst.astype(np.int32),
            "label": labels,
            "original_node_ids": (unique_node_ids - count_instances).astype(np.int64),
            "is_target": node_ids < count_target_instances,
            "is_instance": node_ids < count_instances,
            "is_feature": node_ids >= count_instances,
            "num_nodes": num_nodes,
        }


def batch_graphs(graphs):
    """Disjoint union of dict graphs (dgl.batch equivalent): node ids of
    graph i are offset by the total node count of graphs 0..i-1."""
    out = {"edge_src": [], "edge_dst": [], "label": [], "original_node_ids": [],
           "is_target": [], "is_instance": [], "is_feature": []}
    offset = 0
    graph_sizes = []
    for g in graphs:
        out["edge_src"].append(g["edge_src"] + offset)
        out["edge_dst"].append(g["edge_dst"] + offset)
        for k in ("label", "original_node_ids", "is_target",
                  "is_instance", "is_feature"):
            out[k].append(g[k])
        graph_sizes.append(g["num_nodes"])
        offset += g["num_nodes"]
    batched = {k: np.concatenate(v) for k, v in out.items()}
    batched["num_nodes"] = offset
    batched["graph_sizes"] = np.asarray(graph_sizes)
    return batched
