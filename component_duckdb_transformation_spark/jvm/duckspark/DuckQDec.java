package duckspark;

import org.apache.spark.sql.api.java.UDF3;
import scala.collection.Iterator;
import scala.collection.Seq;
import java.math.BigDecimal;
import java.math.BigInteger;
import java.math.RoundingMode;
import java.util.Arrays;

/**
 * Wide-DECIMAL (w &gt; 15) quantile fold: the unscaled integers no
 * longer fit a double, so the SQL-side CAST(... AS BIGINT) machinery
 * the w &lt;= 15 paths use cannot represent them. This core replicates
 * DuckDB's hugeint quantile arithmetic exactly (probed, r13):
 * values sort EXACTLY (BigInteger order over the unscaled values);
 * quantile_cont interpolation depends on the declared width's BACKING
 * TYPE (calibrated on 700 two-point cases, 100% each): int64-backed
 * widths (16..18) use lo_dbl + delta_dbl * frac with the EXACT
 * integer delta (the w<=15 SQL path's formula — identical there since
 * everything is double-exact); hugeint-backed widths (19..38) use the
 * weighted form (higher-pos)*lo_dbl + (pos-lower)*hi_dbl over the
 * nearest-double images of the unscaled integers. DuckDB itself is
 * double-approximate in both — never exact-integer. The result
 * truncates toward zero via the EXACT binary expansion of the double
 * (new BigDecimal(double), not the shortest repr Spark's double->
 * decimal cast would take); quantile_disc/median select the exact
 * element (lower middle for even counts) with no arithmetic at all.
 *
 * cfg = "op#scale#width", op in {qcont, qdisc}; median(DECIMAL) IS
 * quantile_disc at 0.5 (probed r12). Input arrives cast to
 * ARRAY&lt;DECIMAL(38,s)&gt; so the scale is uniform; the answer
 * returns as a plain decimal string the SQL wrapper casts back to
 * DECIMAL(w,s) losslessly. NULL elements are skipped; empty -> NULL.
 */
public class DuckQDec
    implements UDF3<Seq<BigDecimal>, Double, String, String> {

    @Override
    public String call(Seq<BigDecimal> arr, Double q, String cfg) {
        if (arr == null || q == null || cfg == null) return null;
        if (arr.size() > (1 << 25))
            throw new IllegalStateException(
                "DuckQDec: group/frame exceeds 2^25 collected decimals"
                + " — restructure the query (same bound as the"
                + " collect_list template's group limit)");
        String[] parts = cfg.split("#", -1);
        String op = parts[0];
        int scale = Integer.parseInt(parts[1]);
        int width = Integer.parseInt(parts[2]);
        BigInteger[] v = new BigInteger[arr.size()];
        int k = 0;
        Iterator<BigDecimal> it = arr.iterator();
        while (it.hasNext()) {
            BigDecimal b = it.next();
            if (b == null) continue;
            v[k++] = b.setScale(scale).unscaledValue();
        }
        if (k == 0) return null;
        Arrays.sort(v, 0, k);
        BigInteger res;
        if (op.equals("qdisc")) {
            int idx = (int) Math.ceil(q * k);
            if (idx < 1) idx = 1;
            if (idx > k) idx = k;
            res = v[idx - 1];
        } else {
            double pos = q * (k - 1);
            double lower = Math.floor(pos);
            double higher = Math.ceil(pos);
            BigInteger lo = v[Math.min(k - 1, (int) lower)];
            if (higher == lower) {
                res = lo;
            } else {
                BigInteger hi = v[Math.min(k - 1, (int) higher)];
                double r;
                if (width <= 18) {
                    r = lo.doubleValue()
                        + hi.subtract(lo).doubleValue() * (pos - lower);
                } else {
                    r = (higher - pos) * lo.doubleValue()
                        + (pos - lower) * hi.doubleValue();
                }
                res = new BigDecimal(r)
                    .setScale(0, RoundingMode.DOWN)
                    .toBigInteger();
            }
        }
        return new BigDecimal(res, scale).toPlainString();
    }
}
