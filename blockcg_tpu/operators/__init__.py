from blockcg_tpu.operators.base import LinearOperator, MatmatMixin
from blockcg_tpu.operators.csr import CSROperator, ELLOperator
from blockcg_tpu.operators.dia import DIAOperator
from blockcg_tpu.operators.bsr import BSROperator
from blockcg_tpu.operators.bdia import BlockDIAOperator
from blockcg_tpu.operators.cbdia import ConstBlockDIAOperator
from blockcg_tpu.operators.tiled import TiledOperator
from blockcg_tpu.operators.dense import DenseOperator
from blockcg_tpu.operators.realify import RealifiedHermitianOperator, realify
from blockcg_tpu.operators.auto import from_scipy_auto

__all__ = [
    "LinearOperator",
    "MatmatMixin",
    "CSROperator",
    "ELLOperator",
    "DIAOperator",
    "BSROperator",
    "BlockDIAOperator",
    "ConstBlockDIAOperator",
    "TiledOperator",
    "DenseOperator",
    "RealifiedHermitianOperator",
    "realify",
    "from_scipy_auto",
]
