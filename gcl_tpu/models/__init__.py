"""Model registry — same lookup contract as the reference
(model/__init__.py:10-34): every class whose name contains 'Net', 'MLP' or
'Head' in the model modules is registered and retrievable by name.
"""
import logging

from . import mlp as mlps
from . import projection_head as projection_heads
from . import resunet as resunets
from . import simpleunet as simpleunets

MODELS = []


def add_models(module):
    MODELS.extend([
        getattr(module, a) for a in dir(module)
        if ("Net" in a or "MLP" in a or "Head" in a) and not a.startswith("_")
    ])


add_models(simpleunets)
add_models(resunets)
add_models(mlps)
add_models(projection_heads)


def load_model(name):
    """Return the model class registered under `name` (or None)."""
    mdict = {m.__name__: m for m in MODELS}
    if name not in mdict:
        logging.info(f"Invalid model index. You put {name}. Options are:")
        for m in MODELS:
            logging.info("\t* {}".format(m.__name__))
        return None
    return mdict[name]
