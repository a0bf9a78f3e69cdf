package duckspark;

import org.apache.spark.sql.api.java.UDF1;
import org.apache.spark.unsafe.types.CalendarInterval;

/**
 * DuckDB INTERVAL -&gt; VARCHAR writer (r13): "N year(s) M month(s)
 * D day(s) [-]HH:MM:SS[.FFFFFF]" over the (months, days, micros)
 * triple — components render independently with their own signs,
 * pluralize on |value| != 1, years = months/12 truncated toward zero,
 * hours are NOT capped at 24 (INTERVAL '100' HOUR -&gt; '100:00:00'),
 * fractional seconds print with trailing zeros trimmed, and an
 * all-zero interval prints '00:00:00' (probed against DuckDB 1.0 on
 * 20 shape cases).
 *
 * Spark's ANSI interval types are SCALARS (a Duration or a Period),
 * so only one component class is populated per value: Period -&gt;
 * months only; Duration -&gt; micros only (matching DuckDB intervals
 * built from time-unit literals and arithmetic; intervals DuckDB
 * builds with a days component — date subtraction, day literals —
 * render day-split only where the dialect can see the split
 * statically, see _static_interval_literal). A legacy CalendarInterval
 * carries the full triple and renders exactly.
 */
public class DuckIvStr implements UDF1<Object, String> {

    @Override
    public String call(Object v) {
        if (v == null) return null;
        if (v instanceof java.time.Period) {
            java.time.Period p = (java.time.Period) v;
            return render(p.getYears() * 12L + p.getMonths(), 0L, 0L);
        }
        if (v instanceof java.time.Duration) {
            java.time.Duration d = (java.time.Duration) v;
            long micros = d.getSeconds() * 1_000_000L + d.getNano() / 1000L;
            return render(0L, 0L, micros);
        }
        if (v instanceof CalendarInterval) {
            CalendarInterval c = (CalendarInterval) v;
            return render(c.months, c.days, c.microseconds);
        }
        throw new IllegalStateException(
            "DuckIvStr: unsupported interval class " + v.getClass());
    }

    static String render(long months, long days, long micros) {
        StringBuilder sb = new StringBuilder();
        long years = months / 12;
        long m = months % 12;
        if (years != 0) {
            sb.append(years).append(Math.abs(years) == 1
                ? " year" : " years");
        }
        if (m != 0) {
            if (sb.length() > 0) sb.append(' ');
            sb.append(m).append(Math.abs(m) == 1 ? " month" : " months");
        }
        if (days != 0) {
            if (sb.length() > 0) sb.append(' ');
            sb.append(days).append(Math.abs(days) == 1 ? " day" : " days");
        }
        if (micros != 0 || sb.length() == 0) {
            if (sb.length() > 0) sb.append(' ');
            long a = Math.abs(micros);
            if (micros < 0) sb.append('-');
            long hh = a / 3_600_000_000L;
            long mm = (a / 60_000_000L) % 60;
            long ss = (a / 1_000_000L) % 60;
            long fr = a % 1_000_000L;
            sb.append(String.format("%02d:%02d:%02d", hh, mm, ss));
            if (fr != 0) {
                String f = String.format("%06d", fr);
                int end = f.length();
                while (end > 0 && f.charAt(end - 1) == '0') end--;
                sb.append('.').append(f, 0, end);
            }
        }
        return sb.toString();
    }
}
