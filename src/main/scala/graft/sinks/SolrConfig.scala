package graft.sinks

/** K5 (config half) — Solr core-config generation, the analog of
  * `06_prepare_db_import/make_solr_config.py:31-54`: per observed property
  * the nodes/edges schemas get an indexed multiValued string field plus
  * `str_*` (docValues, exact) and `lowercase_*` (case-folded) copyFields,
  * and the autocomplete core gets the whitespace/edge-ngram analyzed
  * label fields (`solr_config_template/grebi_autocomplete/conf/
  * schema.xml:116-167`). Emission is programmatic — the field list is the
  * data-dependent part, everything else is the fixed analyzer scaffolding.
  */
object SolrConfig {

  /** Solr-safe field name (make_solr_config.py:33-34). */
  def fieldName(prop: String): String = prop.replace(":", "__").replace("&", "_")

  /** The per-property block substituted for [[GREBI_FIELDS]]. */
  def fieldBlock(props: Seq[String]): String =
    props.map(fieldName).distinct.sorted.map { f =>
      s"""    <field name="$f" type="string" indexed="true" stored="false" required="false" multiValued="true" />
         |    <copyField source="$f" dest="str_$f"/>
         |    <copyField source="$f" dest="lowercase_$f"/>""".stripMargin
    }.mkString("\n")

  private val builtinFields: String =
    Seq("grebi__nodeId", "grebi__datasources", "grebi__subgraph").map { f =>
      s"""    <field name="$f" type="string" indexed="true" stored="true" required="false" multiValued="true" />
         |    <copyField source="$f" dest="str_$f"/>
         |    <copyField source="$f" dest="lowercase_$f"/>""".stripMargin
    }.mkString("\n")

  /** Dynamic-field + analyzer scaffolding shared by the nodes/edges cores
    * (template schema.xml:146-152,190-205). */
  private val dynamicAndTypes: String =
    """    <dynamicField name="str_*" type="strings" stored="true" docValues="true" indexed="false" useDocValuesAsStored="false"/>
      |    <dynamicField name="lowercase_*" type="grebilowercase" stored="false" indexed="true" multiValued="true" />
      |    <fieldType name="string" class="solr.StrField" sortMissingLast="true" docValues="true" />
      |    <fieldType name="strings" class="solr.StrField" sortMissingLast="true" multiValued="true" docValues="true" />
      |    <fieldType name="grebilowercase" class="solr.TextField" positionIncrementGap="100">
      |        <analyzer>
      |            <tokenizer class="solr.KeywordTokenizerFactory"/>
      |            <filter class="solr.LowerCaseFilterFactory"/>
      |        </analyzer>
      |    </fieldType>""".stripMargin

  def coreSchema(props: Seq[String]): String =
    s"""<?xml version="1.0" encoding="UTF-8" ?>
       |<schema name="grebi" version="1.6">
       |$builtinFields
       |${fieldBlock(props)}
       |$dynamicAndTypes
       |</schema>
       |""".stripMargin

  /** Autocomplete core: label analyzed whole-string (edge ngram), by
    * whitespace token, and by whitespace token + edge ngram — the three
    * match tiers Query.autocomplete scores (template
    * grebi_autocomplete/conf/schema.xml:116-167). */
  def autocompleteSchema: String =
    """<?xml version="1.0" encoding="UTF-8" ?>
      |<schema name="grebi_autocomplete" version="1.6">
      |    <field name="label" type="string" indexed="true" stored="true" required="true" multiValued="false" />
      |    <copyField source="label" dest="whitespace_label"/>
      |    <copyField source="label" dest="edge_label"/>
      |    <copyField source="label" dest="whitespace_edge_label"/>
      |    <field name="whitespace_label" type="textWhitespace" indexed="true" stored="true" multiValued="false"/>
      |    <field name="edge_label" type="textEdge" indexed="true" stored="true" multiValued="false" />
      |    <field name="whitespace_edge_label" type="textWhitespaceEdge" indexed="true" stored="true" multiValued="false" />
      |    <fieldType name="string" class="solr.StrField" sortMissingLast="true" docValues="true" />
      |    <fieldType name="textWhitespace" class="solr.TextField">
      |        <analyzer type="index">
      |            <tokenizer class="solr.WhitespaceTokenizerFactory"/>
      |            <filter class="solr.LowerCaseFilterFactory"/>
      |            <filter class="solr.RemoveDuplicatesTokenFilterFactory"/>
      |        </analyzer>
      |        <analyzer type="query">
      |            <tokenizer class="solr.WhitespaceTokenizerFactory"/>
      |            <filter class="solr.LowerCaseFilterFactory"/>
      |            <filter class="solr.RemoveDuplicatesTokenFilterFactory"/>
      |        </analyzer>
      |    </fieldType>
      |    <fieldType name="textEdge" class="solr.TextField">
      |        <analyzer type="index">
      |            <tokenizer class="solr.KeywordTokenizerFactory"/>
      |            <filter class="solr.LowerCaseFilterFactory"/>
      |            <filter class="solr.EdgeNGramFilterFactory" minGramSize="1" maxGramSize="35" />
      |        </analyzer>
      |        <analyzer type="query">
      |            <tokenizer class="solr.KeywordTokenizerFactory"/>
      |            <filter class="solr.LowerCaseFilterFactory"/>
      |        </analyzer>
      |    </fieldType>
      |    <fieldType name="textWhitespaceEdge" class="solr.TextField">
      |        <analyzer type="index">
      |            <tokenizer class="solr.WhitespaceTokenizerFactory"/>
      |            <filter class="solr.LowerCaseFilterFactory"/>
      |            <filter class="solr.RemoveDuplicatesTokenFilterFactory"/>
      |            <filter class="solr.EdgeNGramFilterFactory" minGramSize="1" maxGramSize="35" />
      |        </analyzer>
      |        <analyzer type="query">
      |            <tokenizer class="solr.WhitespaceTokenizerFactory"/>
      |            <filter class="solr.LowerCaseFilterFactory"/>
      |            <filter class="solr.RemoveDuplicatesTokenFilterFactory"/>
      |        </analyzer>
      |    </fieldType>
      |</schema>
      |""".stripMargin

  /** Write the full config tree: nodes + edges cores (per-prop fields,
    * core.properties naming) and the autocomplete core
    * (make_solr_config.py:22-37). */
  def write(outDir: String, subgraphName: String,
            nodeProps: Seq[String], edgeProps: Seq[String]): Unit = {
    import java.nio.file.{Files, Paths}
    def core(name: String, schema: String): Unit = {
      val conf = Paths.get(outDir, name, "conf")
      Files.createDirectories(conf)
      Files.writeString(Paths.get(outDir, name, "core.properties"), s"name=$name\n")
      Files.writeString(conf.resolve("schema.xml"), schema)
    }
    core(s"grebi_nodes_$subgraphName", coreSchema(nodeProps))
    core(s"grebi_edges_$subgraphName", coreSchema(edgeProps))
    core(s"grebi_autocomplete_$subgraphName", autocompleteSchema)
  }
}
