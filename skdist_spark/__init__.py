"""skdist_spark: a PySpark-native rebuild of the capabilities of
Ibotta/sk-dist (distributed scikit-learn meta-estimators), extended
with large-scale data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) and an oracle-checked analytics
query layer.

Everything here is self-contained: a small numpy estimator library
(`skdist_spark.ml`) provides the sklearn estimator protocol, and the
``Dist*`` meta-estimators distribute any object speaking that protocol
(including real scikit-learn estimators when installed).
"""

__version__ = "0.1.0"

__all__ = ["__version__"]
