package duckspark;

import org.apache.spark.sql.api.java.UDF2;

/**
 * DuckDB's round(DOUBLE, k) — the compiled twin of dialect.py's
 * `_duck_round_double_py` / the retired `_round_double_sql` /
 * `_round_double_dynamic_sql` CASE cascades (verified exact vs DuckDB
 * over 270k randomized (value, scale) pairs for k in [-400, 400]):
 * scaled multiply by the correctly-rounded power 1e|k| (parseDouble ==
 * Spark literal parse == DuckDB pow(10,k)), std::round emulated as
 * sign-split floor(|s| + 0.5) below 2^52 (halves exact there; above,
 * every double is integral so round(s) = s rides THROUGH the unscale —
 * (x*p)/p keeps DuckDB's 1-ulp multiply/divide drift), then DuckDB's
 * non-finite fallbacks: a NaN scale or non-finite unscale returns the
 * input for k >= 0 and +0.0 for k < 0. |k| >= 309 lands on the
 * Infinity power, whose NaN-producing unscale reproduces the same
 * fallbacks, so clamping at 309 is exact. NULL k -> NULL (the dynamic
 * spelling's rule). Callers keep the typeof() dispatch in SQL: only
 * 'double'/'float' inputs route here.
 */
public class DuckRound implements UDF2<Double, Integer, Double> {

    static final double[] POWERS = new double[310];
    static {
        for (int i = 0; i < 310; i++) {
            POWERS[i] = Double.parseDouble("1e" + i); // 1e309 == Infinity
        }
    }

    @Override
    public Double call(Double x, Integer k) {
        if (x == null || k == null) return null;
        return round(x, k);
    }

    static double round(double v, int k) {
        int kk = Math.max(-309, Math.min(309, k));
        double p = POWERS[Math.abs(kk)];
        double s = (kk >= 0) ? v * p : v / p;
        if (Double.isNaN(s)) return (kk >= 0) ? v : 0.0;
        double r;
        if (Math.abs(s) >= 4503599627370496.0) {
            r = s; // 2^52: s is integral, std::round(s) = s
        } else if (Math.copySign(1.0, s) < 0) {
            r = -Math.floor(-s + 0.5); // keeps IEEE -0.0
        } else {
            r = Math.floor(s + 0.5);
        }
        double res = (kk >= 0) ? r / p : r * p;
        if (Double.isNaN(res) || Double.isInfinite(res))
            return (kk >= 0) ? v : 0.0;
        return res;
    }
}
