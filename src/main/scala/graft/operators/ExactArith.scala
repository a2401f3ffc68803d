package graft.operators

/** Exact scaled floor division for the ppm/micro readouts.
  *
  * The naive form `(num · scale) div den` overflows DECIMAL(38) as
  * soon as num > 10³⁸/scale — for ppm scales that is 10³², a full 10⁶×
  * below the numerators' own representable range, and with ANSI off
  * the overflow is a silent NULL in the reported metric. The split
  * identity (num = q·den + r, 0 ≤ r < den)
  *
  *   floor(num·scale/den) = q·scale + floor(r·scale/den)
  *
  * is exact for NONNEGATIVE operands (every numerator fed here is an
  * abs-sum or offset-nonnegative by construction) and moves the
  * overflow point out to r·scale > 10³⁸, i.e. den > 10³²: for the
  * drift/diversity denominators (n_a·n_b·2²⁰-class) that is ~10¹³
  * vectors PER SIDE — beyond the 100 TB posture, and the residual
  * edge still surfaces as NULL, never a wrapped value (the final
  * BIGINT cast is the caller's).
  *
  * SQL-fragment form because the call sites compose named columns
  * inside `expr(...)`; operands must be nonnegative integers (any
  * exact-integer type — the fragments cast through DECIMAL(38,0)). */
object ExactArith {

  /** `floor((num · scale) / den)` as a SQL fragment, split-form. */
  def scaledFloorDivSql(num: String, den: String, scale: Long): String =
    s"(CAST((CAST($num AS DECIMAL(38,0)) div CAST($den AS DECIMAL(38,0)))" +
      s" AS DECIMAL(38,0)) * $scale" +
      s" + ((CAST($num AS DECIMAL(38,0)) % CAST($den AS DECIMAL(38,0)))" +
      s" * $scale) div CAST($den AS DECIMAL(38,0)))"
}
