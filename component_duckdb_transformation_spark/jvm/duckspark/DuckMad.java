package duckspark;

import org.apache.spark.sql.api.java.UDF2;
import scala.collection.Iterator;
import scala.collection.Seq;
import java.util.Arrays;

/**
 * mad(x) fold over one collected frame/group array (dialect.py
 * _mad_fold_sql's compiled core): median(abs(x - median(x))) over a
 * double array, empty -> NULL. integerDomain applies DuckDB's
 * temporal-median rounding floor(m + 0.5) to BOTH medians (epoch
 * micros shim). Bit-identical to the interpreted SQL fold: same sort,
 * same (a+b)/2.0 midpoint, same IEEE abs/sub — just compiled, so the
 * per-row O(frame log frame) constant is ~100x smaller than the
 * interpreted transform chain it replaces.
 */
public class DuckMad implements UDF2<Seq<Double>, Boolean, Double> {
    @Override
    public Double call(Seq<Double> arr, Boolean integerDomain) {
        if (arr == null || integerDomain == null) return null;
        int n = arr.size();
        double[] v = new double[n];
        int m = 0;
        Iterator<Double> it = arr.iterator();
        while (it.hasNext()) {
            Double d = it.next();
            if (d != null) v[m++] = d;
        }
        if (m == 0) return null;
        Arrays.sort(v, 0, m);
        double med = DuckFolds.median(v, m, integerDomain);
        for (int i = 0; i < m; i++) {
            v[i] = Math.abs(v[i] - med);
        }
        Arrays.sort(v, 0, m);
        return DuckFolds.median(v, m, integerDomain);
    }
}
