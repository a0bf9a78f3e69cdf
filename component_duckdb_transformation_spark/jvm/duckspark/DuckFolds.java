package duckspark;

/** Shared compiled array-fold cores for the window/grouped aggregate
 *  lowerings in dialect.py (mad/entropy frame-materialization). Each
 *  static core replicates the retired interpreted higher-order SQL
 *  fold bit-for-bit (same IEEE operation order), just compiled. */
final class DuckFolds {
    private DuckFolds() {}

    /** DuckDB median over a sorted double slice [0, n). */
    static double median(double[] s, int n, boolean integerDomain) {
        double m;
        if (n % 2 == 1) {
            m = s[(n + 1) / 2 - 1];
        } else {
            m = (s[n / 2 - 1] + s[n / 2]) / 2.0;
        }
        // temporal mad works in integer micros: floor(x + 0.5)
        return integerDomain ? Math.floor(m + 0.5) : m;
    }
}
