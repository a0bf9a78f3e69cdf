package duckspark;

/** Shared compiled array-fold cores for the window/grouped aggregate
 *  lowerings in dialect.py (mad/entropy frame-materialization). Each
 *  static core replicates the retired interpreted higher-order SQL
 *  fold bit-for-bit (same IEEE operation order), just compiled. */
final class DuckFolds {
    private DuckFolds() {}

    /** DuckDB median over a sorted double slice [0, n). mode 0 keeps
     *  the exact double; 1 is the temporal epoch-micros rounding
     *  floor(m + 0.5); 2 is the DECIMAL unscaled-integer domain's
     *  truncation toward zero (DuckDB's integer Interpolate, r13). */
    static double median(double[] s, int n, int mode) {
        double m;
        if (n % 2 == 1) {
            m = s[(n + 1) / 2 - 1];
        } else {
            m = (s[n / 2 - 1] + s[n / 2]) / 2.0;
        }
        if (!Double.isFinite(m)) return m;
        if (mode == 1) return Math.floor(m + 0.5);
        if (mode == 2) return (double) (long) m;
        return m;
    }

    static double median(double[] s, int n, boolean integerDomain) {
        return median(s, n, integerDomain ? 1 : 0);
    }
}
