package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Cross-engine floating-point conventions shared by every operator whose
  * output is replayed by the DuckDB oracle (the VecDot convention's
  * companion: fold dots in element order, round to 6 dp, and — this file —
  * normalize IEEE negative zero).
  *
  * Why: Spark's `round` routes through `BigDecimal` HALF_UP, which has no
  * negative zero, so `round(-1e-16, 6)` is `+0.0`; DuckDB's `round` is
  * libm-style and returns `-0.0` for the same input. The two zeros compare
  * equal but serialize to different parquet bits, so any rounded expression
  * that can land on zero FROM BELOW (cosines, ADC inner products,
  * z-scores, Fourier sin/cos at exact cycle multiples) hash-diverges
  * between the engines — exactly the `q_ts_forecast_input` round-7 red row.
  */
object CrossEngine {

  /** Maps -0.0 → +0.0 and is the identity elsewhere (IEEE 754:
    * `-0.0 + 0.0 = +0.0`; `x + 0.0 = x` for every other double, including
    * NaN and ±Inf). Apply to every rounded OUTPUT column that can be
    * negative, and mirror with `+ 0` in the oracle SQL: the normalization
    * then holds by construction on both engines instead of depending on
    * fixtures never hitting a tiny-negative value. Comparisons
    * (threshold filters, top-k ordering) never need it — ±0.0 compare
    * equal in both engines — only hashed output does. */
  def normZero(x: Column): Column = x + lit(0.0)
}
