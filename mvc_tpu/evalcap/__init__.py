from mvc_tpu.evalcap.bleu import Bleu
from mvc_tpu.evalcap.rouge import Rouge
from mvc_tpu.evalcap.cider import Cider
from mvc_tpu.evalcap.meteor import Meteor
from mvc_tpu.evalcap.spice import Spice
from mvc_tpu.evalcap.eval import NLPScore, COCOEvalCap

__all__ = ["Bleu", "Rouge", "Cider", "Meteor", "Spice", "NLPScore", "COCOEvalCap"]
