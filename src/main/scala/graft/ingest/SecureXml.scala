package graft.ingest

import java.io.ByteArrayInputStream

/** Shared hardened XML parsing for the OOXML codecs. JAXP factory
  * construction is the dominant cost of small-part parsing (service
  * discovery + feature wiring per call); a per-thread builder amortizes
  * it across the millions of per-row decodes an executor core performs,
  * with `reset()` between documents. Hardening is identical everywhere:
  * untrusted input, so no doctypes and no external entities. */
private[ingest] object SecureXml {

  private val local =
    new ThreadLocal[javax.xml.parsers.DocumentBuilder] {
      override def initialValue(): javax.xml.parsers.DocumentBuilder = {
        val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        dbf.setNamespaceAware(true)
        dbf.setFeature(
          "http://apache.org/xml/features/disallow-doctype-decl", true)
        dbf.setExpandEntityReferences(false)
        dbf.newDocumentBuilder()
      }
    }

  def parse(xml: Array[Byte]): org.w3c.dom.Document = {
    val b = local.get()
    b.reset()
    b.parse(new ByteArrayInputStream(xml))
  }
}
