"""M1-M9 — rank model: assemble the fixed slot layout, train an FM-family
classifier, evaluate AUC, score candidates in distributed batches.

Reference: offline/rank/s2_model_train.py + offline/torchfm (DeepFM: linear +
FM second-order + small MLP, BCE/Adam, early stop on AUC; test AUC 0.8206).
MLlib analog: ``FMClassifier`` (factorized machines = the FM core; factorSize
matches the reference's id-embedding dim) with LogisticRegression as the
linear-only baseline. Parity is metric-level (AUC threshold), not bitwise
(SURVEY trap #5). Scoring is ``model.transform`` — Tungsten-batched, the
analog of the reference's chunked Triton calls (M9) without the RPC.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import FMClassifier, LogisticRegression
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from recsys_pipeline_spark.schemas import EMBEDDING_DIM


def assembler(feature_cols: list[str]) -> VectorAssembler:
    """M1: the ordered slot layout — VectorAssembler preserves input order."""
    return VectorAssembler(inputCols=list(feature_cols), outputCol="features", handleInvalid="keep")


def feature_stages(feature_cols: list[str], categorical_cols: list[str] | None):
    """M1 with optional one-hot expansion of the sparse-id/categorical slots.

    The reference's DeepFM looks up an embedding row per categorical VALUE
    (torchfm/layer.py FeaturesEmbedding); MLlib's FMClassifier factorizes
    FEATURE INDICES, so the id must become a one-hot dimension for the factor
    matrix to hold one latent row per id — feeding the raw integer id gives
    the model a single scalar slot and no per-id embedding (measured AUC
    collapse on the planted fixture: 0.52 raw vs 0.8+ one-hot). OHE emits
    sparse vectors, so the assembled row stays O(#fields), not O(#ids).
    """
    if not categorical_cols:
        return [assembler(feature_cols)]
    from pyspark.ml.feature import OneHotEncoder

    cat = [c for c in categorical_cols if c in feature_cols]
    rest = [c for c in feature_cols if c not in cat]
    ohe = OneHotEncoder(
        inputCols=cat,
        outputCols=[f"_oh_{c}" for c in cat],
        handleInvalid="keep",
        dropLast=False,
    )
    asm = VectorAssembler(
        inputCols=[f"_oh_{c}" for c in cat] + rest,
        outputCol="features",
        handleInvalid="keep",
    )
    return [ohe, asm]


def train_rank_model(
    train_df: DataFrame,
    feature_cols: list[str],
    algo: str = "fm",
    factor_size: int = EMBEDDING_DIM,
    max_iter: int = 20,
    reg: float = 1e-5,
    seed: int = 123,
    hidden_layers: tuple[int, ...] = (16, 8),
    shuffle_seed: int | None = None,
    categorical_cols: list[str] | None = None,
) -> PipelineModel:
    """M2-M7: fit assembler + classifier as one PipelineModel (persistable
    with MLlib-native save/load — the analog of the ONNX export M11).

    ``algo="mlp"`` is the M4 dense branch (reference
    offline/torchfm/model.py:65-84): a MultilayerPerceptronClassifier whose
    input layer is sized to ``feature_cols`` — callers pass the DENSE slots
    only, since MLlib's MLP has no embedding layer for sparse ids (the FM
    branch covers those; ``train_deepfm`` fuses the two).

    ``shuffle_seed`` opts into the W5 seeded pre-training shuffle
    (operators/split.seeded_shuffle) for the SGD-family algos whose minibatch
    statistics see row order; it is a real sort, so never on by default."""
    if shuffle_seed is not None:
        from recsys_pipeline_spark.operators.split import seeded_shuffle

        train_df = seeded_shuffle(train_df, seed=shuffle_seed)
    if algo == "fm":
        clf = FMClassifier(
            featuresCol="features", labelCol="label", factorSize=factor_size,
            stepSize=0.1, maxIter=max_iter, regParam=reg, seed=seed,
        )
    elif algo == "lr":
        clf = LogisticRegression(
            featuresCol="features", labelCol="label", maxIter=max_iter, regParam=reg
        )
    elif algo == "mlp":
        from pyspark.ml.classification import MultilayerPerceptronClassifier

        if categorical_cols:
            raise ValueError("mlp consumes dense slots only — no categorical_cols")
        clf = MultilayerPerceptronClassifier(
            featuresCol="features", labelCol="label",
            layers=[len(feature_cols), *hidden_layers, 2],
            maxIter=max_iter, seed=seed, solver="l-bfgs",
        )
    else:
        raise ValueError(f"unknown algo {algo!r} (expected 'fm', 'lr' or 'mlp')")
    pipe = Pipeline(stages=[*feature_stages(feature_cols, categorical_cols), clf])
    return pipe.fit(train_df)


class DeepFMModel:
    """M5 — the DeepFM composite (reference offline/torchfm/model.py:109-157:
    sigmoid(linear + FM-second-order + MLP)) re-expressed with MLlib parts:

      * FMClassifier over the FULL slot layout = linear + factorized
        second-order terms over sparse ids and dense features;
      * MultilayerPerceptronClassifier over the DENSE slots = the deep branch
        (MLlib's MLP has no embedding table, so the deep branch consumes the
        z-scored dense features directly — the honest analog, not a fake
        embedding);
      * fusion = sigmoid(logit_fm + logit_mlp), the reference's pre-sigmoid
        logit sum.

    MLlib cannot train the two branches jointly (no shared autograd), so this
    is a logit-sum ensemble — branch selection semantics match, weight
    coupling does not; parity is metric-level (AUC), per SURVEY trap #5.
    ``transform`` emits rawPrediction/probability/prediction with the same
    shapes as any MLlib classifier, so ``score``/``auc`` work unchanged.
    """

    def __init__(self, fm: PipelineModel, mlp: PipelineModel):
        self.fm = fm
        self.mlp = mlp

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.functions import array_to_vector, vector_to_array

        eps = F.lit(1e-9)
        fm_scored = self.fm.transform(df)
        z_fm = F.element_at(vector_to_array(F.col("rawPrediction")), 2)
        base = fm_scored.select(*df.columns, z_fm.alias("_z_fm"))
        mlp_scored = self.mlp.transform(base)
        # MLPC's rawPrediction is the softmax output; recover the logit as
        # the log-odds so both branches fuse on the same (pre-sigmoid) scale
        mp = vector_to_array(F.col("probability"))
        z_mlp = F.log(F.element_at(mp, 2) + eps) - F.log(F.element_at(mp, 1) + eps)
        z = F.col("_z_fm") + z_mlp
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        return mlp_scored.select(
            *df.columns,
            array_to_vector(F.array(-z, z)).alias("rawPrediction"),
            array_to_vector(F.array(F.lit(1.0) - p, p)).alias("probability"),
            (p > 0.5).cast("double").alias("prediction"),
        )


def train_deepfm(
    train_df: DataFrame,
    feature_cols: list[str],
    dense_cols: list[str],
    factor_size: int = EMBEDDING_DIM,
    max_iter: int = 20,
    reg: float = 1e-5,
    seed: int = 123,
    hidden_layers: tuple[int, ...] = (16, 8),
    categorical_cols: list[str] | None = None,
) -> DeepFMModel:
    """M4+M5: fit the FM branch on the full layout (categoricals one-hot so
    the factor matrix holds per-id embeddings) and the MLP branch on the
    dense slots, fused by DeepFMModel."""
    fm = train_rank_model(
        train_df, feature_cols, algo="fm", factor_size=factor_size,
        max_iter=max_iter, reg=reg, seed=seed, categorical_cols=categorical_cols,
    )
    mlp = train_rank_model(
        train_df, dense_cols, algo="mlp", max_iter=max_iter, reg=reg, seed=seed,
        hidden_layers=hidden_layers,
    )
    return DeepFMModel(fm, mlp)


def train_with_early_stop(
    train_df: DataFrame,
    valid_df: DataFrame,
    feature_cols: list[str],
    algo: str = "fm",
    factor_size: int = EMBEDDING_DIM,
    iter_step: int = 5,
    max_rounds: int = 20,
    patience: int = 5,
    reg: float = 1e-5,
    seed: int = 123,
) -> tuple[PipelineModel, float, int]:
    """M7 — the reference's early stopping (offline/torchfm/train.py:6-24):
    grow training effort, evaluate validation AUC each round, keep the best
    model, stop after ``patience`` non-improving rounds.

    MLlib estimators cannot warm-start between fits, so each round refits with
    a larger iteration budget (maxIter = round * iter_step) — the *selection
    semantics* (best-AUC checkpoint + patience) match the reference exactly;
    the retrain-per-round cost is the MLlib trade-off and parallelizes the
    same way any fit does. -> (best_model, best_auc, best_max_iter).
    """
    best_model, best_auc, best_iter = None, float("-inf"), 0
    bad = 0
    for r in range(1, max_rounds + 1):
        m = train_rank_model(
            train_df, feature_cols, algo=algo, factor_size=factor_size,
            max_iter=r * iter_step, reg=reg, seed=seed,
        )
        a = auc(m, valid_df)
        if a > best_auc:
            best_model, best_auc, best_iter = m, a, r * iter_step
            bad = 0
        else:
            bad += 1
            if bad >= patience:
                break
    return best_model, best_auc, best_iter


def score(model: PipelineModel, df: DataFrame, score_col: str = "score") -> DataFrame:
    """M9: distributed batch inference; the positive-class probability is the
    ranking score (sigmoid output in the reference)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    prob_to_score = F.element_at(vector_to_array(F.col("probability")), 2).cast("double")
    keep = [c for c in df.columns if c not in ("features",)]
    return scored.select(*keep, prob_to_score.alias(score_col))


def auc(model: PipelineModel, test_df: DataFrame) -> float:
    """M8: areaUnderROC on the held-out split."""
    scored = model.transform(test_df)
    ev = BinaryClassificationEvaluator(
        rawPredictionCol="rawPrediction", labelCol="label", metricName="areaUnderROC"
    )
    return float(ev.evaluate(scored))
