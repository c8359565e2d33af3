from crypto_rec_tpu.models.rec.engine import RatingSet, recommend, predict_scores  # noqa: F401
from crypto_rec_tpu.models.rec.validate import ten_fold_mae  # noqa: F401
