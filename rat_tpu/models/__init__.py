from .rat import RATModel, build_model, VARIANTS

# reference-compatible aliases (fuxictr/pytorch/models/__init__.py:1-5)
RAT_m0 = "RAT_m0"
RAT_m1 = "RAT_m1"
RAT_m2 = "RAT_m2"
RAT_m3 = "RAT_m3"
