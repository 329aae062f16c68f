package graft;

import java.lang.annotation.ElementType;
import java.lang.annotation.Inherited;
import java.lang.annotation.Retention;
import java.lang.annotation.RetentionPolicy;
import java.lang.annotation.Target;
import org.scalatest.TagAnnotation;

/**
 * Suite-level tag for the DEEP test lane: multi-minute fuzz / replay /
 * invariance / round-retrospective suites excluded from the default
 * `sbt test` so the driver's test gate finishes inside its time budget
 * (round-16 verdict item #2: the full 514-test suite ran 32+ min and the
 * driver cut it mid-run). `SPARK_GRAFT_TEST_LANE=all` runs everything,
 * `=deep` runs only these (see build.sbt / TUNING.md "Test lanes").
 */
@TagAnnotation
@Inherited
@Retention(RetentionPolicy.RUNTIME)
@Target({ElementType.TYPE})
public @interface DeepTest {}
