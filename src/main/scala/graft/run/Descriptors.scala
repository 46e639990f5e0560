package graft.run

/** Canonical descriptors. `imfJson` re-expresses the reference's only
  * documented conversion (reference: data/imf.csv:1-9 + the default
  * build/convert workflow, README.md:18-46) over the webtext fixture
  * corpus: subject minted from the country field, two digit-grouped
  * integer literals, one language-tagged string, one virtual rdf:type
  * triple and one provenance link back to the page (virtual-column
  * semantics, src/templates/ruminator.html:145-180).
  */
object Descriptors {

  val imfJson: String =
    """{
      |  "@base": "http://graft.local/imf/",
      |  "aboutUrl": "country/{country}",
      |  "graph": "http://graft.local/graph/imf",
      |  "prefixes": { "ex": "http://graft.local/imf/vocab/" },
      |  "extractors": {
      |    "country": "Country profile: (.+?) Rank:",
      |    "rank": "Rank: ([0-9,]+) GDP",
      |    "gdp": "GDP per capita \\(Int\\$\\): ([0-9,]+)"
      |  },
      |  "tableSchema": { "columns": [
      |    { "name": "rank", "propertyUrl": "ex:rank",
      |      "datatype": "integer", "transforms": ["strip-grouping"] },
      |    { "name": "gdp", "propertyUrl": "ex:gdpPerCapita",
      |      "datatype": "xsd:integer", "transforms": ["strip-grouping"] },
      |    { "name": "country", "propertyUrl": "ex:name",
      |      "datatype": "string", "lang": "en" },
      |    { "name": "type_v", "virtual": true,
      |      "propertyUrl": "rdf:type", "valueUrl": "ex:Country",
      |      "aboutUrl": "country/{country}" },
      |    { "name": "prov_v", "virtual": true,
      |      "propertyUrl": "prov:wasDerivedFrom", "valueUrl": "{+url}",
      |      "aboutUrl": "country/{country}" }
      |  ] }
      |}""".stripMargin
}
