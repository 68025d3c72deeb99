package graft.io

/** S6 `ENV-CONFIG` — dotenv-style credential loading (reference
  * `main.py:27-37`: `load_dotenv()` + `DB_USER/DB_PASS/DB_HOST/DB_PORT/
  * DB_NAME` into the connection config).
  *
  * Parsing rules follow the common dotenv contract: one `KEY=VALUE` per
  * line; blank lines and `#` comments skipped; optional `export ` prefix;
  * single or double quotes around the value stripped; whitespace around key
  * and unquoted values trimmed; first `=` splits (values may contain `=`);
  * process environment wins over file values (dotenv does not override by
  * default). Driver-side config, never distributed.
  */
object EnvConfig {

  /** Parse dotenv content into an ordered key→value map (later duplicate
    * keys win, matching dotenv reload semantics). */
  def parse(content: String): Map[String, String] =
    content.linesIterator.foldLeft(Map.empty[String, String]) { (acc, raw) =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#") || !line.contains("=")) acc
      else {
        val body = if (line.startsWith("export ")) line.stripPrefix("export ").trim else line
        val i = body.indexOf('=')
        val key = body.substring(0, i).trim
        val v0 = body.substring(i + 1).trim
        val value =
          if (v0.length >= 2 &&
            ((v0.head == '"' && v0.last == '"') || (v0.head == '\'' && v0.last == '\'')))
            v0.substring(1, v0.length - 1)
          else v0
        if (key.isEmpty) acc else acc + (key -> value)
      }
    }

  /** Load a dotenv file merged with the process environment — env wins on
    * collisions, exactly like `load_dotenv()` + `os.getenv` (dotenv never
    * overrides an already-set variable). */
  def load(path: String, env: Map[String, String] = sys.env): Map[String, String] = {
    val file = new java.io.File(path)
    val fromFile =
      if (!file.isFile) Map.empty[String, String]
      else {
        val src = scala.io.Source.fromFile(file, "UTF-8")
        try parse(src.mkString)
        finally src.close()
      }
    fromFile ++ env
  }

  /** The reference's DB_* config as JDBC reader inputs
    * (`main.py:30-37,116-121`): (url, user, password). */
  def jdbcConfig(conf: Map[String, String], scheme: String = "postgresql")
      : Option[(String, String, String)] =
    for {
      user <- conf.get("DB_USER")
      pass <- conf.get("DB_PASS")
      host <- conf.get("DB_HOST")
      port <- conf.get("DB_PORT")
      name <- conf.get("DB_NAME")
    } yield (s"jdbc:$scheme://$host:$port/$name", user, pass)
}
